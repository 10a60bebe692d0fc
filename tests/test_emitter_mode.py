"""Emitter-mode pipeline test: a pulser at depth drives the full chain and
triggers a nearby channel; amplitude scales linearly and as 1/R."""
import jax
import jax.numpy as jnp
import numpy as np

from nuradiomc_tpu.models import ice as ice_models
from nuradiomc_tpu.ops import antenna, filters
from nuradiomc_tpu.sim.pipeline import (ChannelParams, EmitterParams,
                                        PipelineSettings, ShowerBatch,
                                        simulate_batch)
from nuradiomc_tpu.utils import units


def _setup(n_groups=4, depth=-700.0):
    fs = 2.0
    n_int, n_base = 256, 512
    freqs_int = np.fft.rfftfreq(n_int, 1 / fs)
    freqs_base = np.fft.rfftfreq(n_base, 1 / fs)
    tpl = antenna.build_analytic_template("analytic_VPol", freqs_int)
    templates = np.zeros((1, 3, len(freqs_int)), dtype=complex)
    templates[0] = tpl[0]
    rot = antenna.antenna_rotation_matrix(0.0, 0.0, np.pi / 2, 0.0)
    chain = [((80 * units.MHz, 1000 * units.GHz), "butter", {"order": 2})]
    filt_b = filters.chain_response(freqs_base, chain)
    filt_i = filters.chain_response(freqs_int, chain)
    ch = ChannelParams(
        positions=jnp.asarray([[0.0, 0.0, -100.0]]),
        cable_delays=jnp.zeros(1),
        rot=jnp.asarray(rot)[None],
        kind=jnp.asarray([1]),
        templates=jnp.asarray(templates),
        filter_response=jnp.asarray(filt_b)[None],
        filter_response_int=jnp.asarray(filt_i)[None],
        threshold_high=jnp.asarray([5e-8]),
        threshold_low=jnp.asarray([-5e-8]),
        noise_amplitude=jnp.asarray([0.0]),
        min_efield_amplitude=jnp.asarray([0.0]),
    )
    settings = PipelineSettings(ice=ice_models.southpole_2015,
                                n_internal=n_int, n_base=n_base,
                                sampling_rate=fs, n_freq_attenuation=16,
                                attenuation_steps=32)
    amp = 1.0 * units.V
    batch = ShowerBatch(
        vertices=jnp.asarray(np.tile([[ [100.0, 0.0, depth] ]], (n_groups, 1, 1))),
        energies=jnp.full((n_groups, 1), amp) * jnp.arange(1, n_groups + 1)[:, None],
        is_em=jnp.zeros((n_groups, 1), dtype=bool),
        shower_mask=jnp.ones((n_groups, 1), dtype=bool),
        prop_dir=jnp.asarray(np.tile([[[0.0, 0.0, 1.0]]], (n_groups, 1, 1))),
        k_L=jnp.full((n_groups, 1), 0.2),   # emitter frequency (unused for delta)
        vertex_times=jnp.zeros((n_groups, 1)),
    )
    emitter = EmitterParams(model="delta_pulse",
                            templates=jnp.asarray(templates[0]),
                            rot=jnp.asarray(rot), kind=1)
    return batch, ch, settings, emitter


def test_emitter_triggers_and_scales_linearly():
    batch, ch, settings, emitter = _setup()
    out = jax.jit(lambda b: simulate_batch(b, ch, settings, emitter=emitter))(batch)
    assert bool(np.all(np.asarray(out.triggered)))
    amps = np.asarray(out.max_amplitude)[:, 0]
    # amplitude linear in pulser voltage
    np.testing.assert_allclose(amps / amps[0], [1, 2, 3, 4], rtol=1e-6)


def test_emitter_amplitude_falls_with_distance():
    near, ch, settings, emitter = _setup(n_groups=1, depth=-300.0)
    far, _, _, _ = _setup(n_groups=1, depth=-1500.0)
    f = jax.jit(lambda b: simulate_batch(b, ch, settings, emitter=emitter))
    a_near = float(np.asarray(f(near).max_amplitude)[0, 0])
    a_far = float(np.asarray(f(far).max_amplitude)[0, 0])
    assert a_near > 2 * a_far > 0
