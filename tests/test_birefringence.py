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


def test_propagation_is_unitary_at_float32():
    """Regression for the gen2 e^30..e^70 trace blowups (2026-08-20): the
    reference's eigenvector formula s_i/(n^2-n_i^2) is cancellation
    garbage at f32 near a principal index, and the transpose-back scan
    amplified the non-orthogonality exponentially over the path. The
    reconditioned scan is R^T diag(k1^2, k2^2 phase) R with R an exact
    rotation and k_i <= 1 the reference's walk-off damping, so
    per-frequency TOTAL POWER |eTheta|^2 + |ePhi|^2 can only DECREASE
    (by the tiny physical damping, <~1e-3 over km paths) — on every
    path, in f32, with no special-casing."""
    ice = ice_models.southpole_2015
    rng = np.random.default_rng(7)
    ff = jnp.asarray(np.fft.rfftfreq(256, 0.5).astype(np.float32))
    spec_t = jnp.asarray((rng.normal(size=len(ff))
                          + 1j * rng.normal(size=len(ff))).astype(np.complex64))
    spec_p = jnp.asarray((rng.normal(size=len(ff))
                          + 1j * rng.normal(size=len(ff))).astype(np.complex64))

    # deep, long-horizontal paths of the kind that blew up (incl. a
    # near-vertical one that sits near the principal-axis degeneracy)
    for x1, x2 in [((2648.7, -409.2, -2583.8), (850.0, 1470.0, -100.0)),
                   ((-883.8, 2781.6, -2285.9), (0.0, 0.0, -150.0)),
                   ((5.0, 0.0, -2600.0), (0.0, 0.0, -100.0))]:
        geom = raytrace.to_2d(jnp.asarray(x1, jnp.float32),
                              jnp.asarray(x2, jnp.float32))
        sols = raytrace.find_solutions(geom.x1y, geom.x1z, geom.x2y,
                                       geom.x2z, ice)
        slot = int(np.argmax(np.asarray(sols.mask)))
        assert bool(np.asarray(sols.mask)[slot])
        path = birefringence.path_points_3d(
            jnp.float32(sols.c0[slot]), geom, ice, 256)
        out_t, out_p = birefringence.propagate_pulse(
            spec_t, spec_p, jnp.asarray(path, jnp.float32), ff, ice)
        p_in = np.abs(np.asarray(spec_t)) ** 2 + np.abs(np.asarray(spec_p)) ** 2
        p_out = (np.abs(np.asarray(out_t)) ** 2
                 + np.abs(np.asarray(out_p)) ** 2)
        assert np.all(p_out <= p_in * (1 + 1e-4)), "scan amplified power"
        assert np.all(p_out >= p_in * (1 - 5e-3)), "over-damped"


def test_pipeline_birefringence_toggle_matches_ops():
    """Toggling PipelineSettings.birefringence applies exactly the standalone
    ops transformation (propagate_pulse on the same fixed-K path) to the
    propagated efield spectra (apply_propagation_effects order: last)."""
    import dataclasses

    import jax

    from nuradiomc_tpu.ops import antenna, filters
    from nuradiomc_tpu.sim.pipeline import (ChannelParams, PipelineSettings,
                                            ShowerBatch, simulate_batch)

    ice = ice_models.southpole_2015
    n_int, n_base = 256, 512
    K = 128
    base = PipelineSettings(
        ice=ice, askaryan_model="Alvarez2000", n_internal=n_int, n_base=n_base,
        sampling_rate=2.0, attenuate_ice=False, apply_focusing=False,
        birefringence_points=K)
    bire = dataclasses.replace(base, birefringence=True)

    freqs_int = np.fft.rfftfreq(n_int, 0.5)
    freqs_base = np.fft.rfftfreq(n_base, 0.5)
    tpl = antenna.build_analytic_template("analytic_VPol", freqs_int)
    templates = np.broadcast_to(tpl[0], (1, 3, len(freqs_int))).astype(complex)
    rot = antenna.antenna_rotation_matrix(0.0, 0.0, np.pi / 2, 0.0)[None]
    filt = np.ones((1, len(freqs_base)), dtype=complex)
    ch = ChannelParams(
        positions=np.array([[0.0, 0.0, -100.0]]),
        cable_delays=np.zeros(1), rot=rot, kind=np.ones(1, dtype=np.int32),
        templates=templates, filter_response=filt,
        filter_response_int=np.ones((1, len(freqs_int)), dtype=complex),
        threshold_high=np.full(1, 1e-6), threshold_low=np.full(1, -1e-6),
        noise_amplitude=np.zeros(1), min_efield_amplitude=np.zeros(1))
    batch = ShowerBatch(
        vertices=np.array([[[400.0, 300.0, -800.0]]]),
        energies=np.array([[1e18]]), is_em=np.array([[False]]),
        shower_mask=np.array([[True]]),
        prop_dir=np.array([[[0.3, -0.2, 0.933]]]) / np.linalg.norm([0.3, -0.2, 0.933]),
        k_L=np.array([[30.0]]), vertex_times=np.zeros((1, 1)))

    out0 = jax.jit(lambda b: simulate_batch(b, ch, base, keep_efields=True))(batch)
    out1 = jax.jit(lambda b: simulate_batch(b, ch, bire, keep_efields=True))(batch)

    mask = np.asarray(out0.sol_mask)[0, 0, 0]
    assert mask.any()
    ff = jnp.asarray(freqs_int)
    x1 = jnp.asarray(batch.vertices[0, 0])
    x2 = jnp.asarray(ch.positions[0])
    geom = raytrace.to_2d(x1, x2)

    for slot in np.where(mask)[0]:
        c0 = out0.c0[0, 0, 0, slot]
        path = birefringence.path_points_3d(c0, geom, ice, K)
        want_t, want_p = birefringence.propagate_pulse(
            out0.efields[0][0, 0, 0, slot], out0.efields[1][0, 0, 0, slot],
            path, ff, ice)
        got_t = np.asarray(out1.efields[0][0, 0, 0, slot])
        got_p = np.asarray(out1.efields[1][0, 0, 0, slot])
        scale = max(np.abs(np.asarray(want_t)).max(),
                    np.abs(np.asarray(want_p)).max())
        np.testing.assert_allclose(got_t, np.asarray(want_t), atol=1e-9 * scale)
        np.testing.assert_allclose(got_p, np.asarray(want_p), atol=1e-9 * scale)
        # the effect is non-trivial: birefringence moved power between pols
        assert not np.allclose(got_p, np.asarray(out0.efields[1][0, 0, 0, slot]),
                               atol=1e-6 * scale)
