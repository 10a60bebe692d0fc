"""Birefringent pulse propagation conformance vs reference golden data."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from nuradiomc_tpu.models import ice as ice_models
from nuradiomc_tpu.ops import birefringence, raytrace

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "birefringence.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def test_effective_indices_symmetry():
    n1, n2 = birefringence.effective_indices(
        jnp.asarray([0.3, 0.5, np.sqrt(1 - 0.09 - 0.25)]), 1.779, 1.7795, 1.778)
    assert float(n1) < float(n2)
    assert 1.77 < float(n1) < 1.78 and 1.77 < float(n2) < 1.78


def test_pulse_propagation_matches_reference(golden):
    ice = ice_models.southpole_2015
    fs = float(golden["fs"])
    N = int(golden["N"])
    ff = jnp.asarray(np.fft.rfftfreq(N, 1 / fs))
    spec_in = golden["input_spec"]
    receiver = golden["receiver"]
    iceflow = float(golden["angle_to_iceflow"]) * np.pi / 180.0

    for k, (x1x, x1y_, x1z, c0_ref, iS) in enumerate(golden["info"]):
        x1 = jnp.asarray([x1x, x1y_, x1z])
        x2 = jnp.asarray(receiver)
        geom = raytrace.to_2d(x1, x2)
        sols = raytrace.find_solutions(geom.x1y, geom.x1z, geom.x2y, geom.x2z, ice)
        # match solution by C0
        rel = np.abs(np.asarray(sols.c0) / c0_ref - 1)
        slot = int(np.argmin(rel))
        assert rel[slot] < 1e-6

        n_pts = int(np.asarray(sols.path_length)[slot])  # ~1 m steps as reference
        path = birefringence.path_points_3d(sols.c0[slot], geom, ice, n_pts,
                                            iceflow_angle=iceflow)
        out_t, out_p = birefringence.propagate_pulse(
            jnp.asarray(spec_in[1]), jnp.asarray(spec_in[2]), path, ff, ice)

        ref = golden["specs"][k]
        scale = np.max(np.abs(ref[1:]))
        np.testing.assert_allclose(np.asarray(out_t) / scale, ref[1] / scale,
                                   atol=2e-2, err_msg=f"sol {k} theta")
        np.testing.assert_allclose(np.asarray(out_p) / scale, ref[2] / scale,
                                   atol=2e-2, err_msg=f"sol {k} phi")
