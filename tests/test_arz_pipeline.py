"""ARZ end-to-end pipeline test: full chain with the ARZ2020 model and the
mini shower library triggers on a strong near-cone event."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from nuradiomc_tpu.ops import arz
from nuradiomc_tpu.sim.pipeline import ShowerBatch, simulate_batch

from __graft_entry__ import _make_settings_and_inputs

MINILIB = os.path.join(os.path.dirname(__file__), "golden", "arz_minilib.pkl")


def test_arz_pipeline_end_to_end():
    import dataclasses

    settings, ch, batch = _make_settings_and_inputs(
        n_groups=8, n_showers=1, n_channels=1, n_internal=256, n_base=512)
    settings = dataclasses.replace(settings, askaryan_model="ARZ2020")
    lib = arz.load_library_pickle(MINILIB)

    batch = ShowerBatch(
        vertices=batch.vertices, energies=jnp.full_like(batch.energies[:, :1], 1e18),
        is_em=batch.is_em[:, :1], shower_mask=batch.shower_mask[:, :1],
        prop_dir=batch.prop_dir[:, :1], k_L=batch.k_L[:, :1],
        vertex_times=batch.vertex_times[:, :1],
        profile_idx=jnp.zeros_like(batch.k_L[:, :1], dtype=jnp.int32))
    batch = batch._replace(vertices=batch.vertices[:, :1])

    out = jax.jit(lambda b: simulate_batch(b, ch, settings,
                                           arz_library=lib))(batch)
    amps = np.asarray(out.max_amplitude)
    assert np.all(np.isfinite(amps))
    # at least some of the random geometries produce signal
    assert (amps > 0).sum() >= 1
    # polarization is recorded and normalized where valid
    pol = np.asarray(out.polarization)
    mask = np.asarray(out.sol_mask)
    norms = np.linalg.norm(pol, axis=-1)[mask]
    assert np.all((norms < 1.01))
