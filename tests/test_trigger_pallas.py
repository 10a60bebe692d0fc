"""Equivalence of the fused Pallas irfft+trigger kernel vs the XLA path.

The kernel (ops/trigger_pallas.py) must reproduce ops.triggers
get_high_low_triggers / get_threshold_triggers + majority_logic and the
irfft-matmul trace assembly bit-for-bit at float32 (CPU interpret mode here;
the chip-side Mosaic lowering is probed by bench.py's conformance assert on
every bench run).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from nuradiomc_tpu.ops import triggers
from nuradiomc_tpu.ops.trigger_pallas import (TriggerSpecStatic,
                                              fused_irfft_trigger)
from nuradiomc_tpu.sim.pipeline import _irfft_matrices


def _reference(traces, th_hi, th_lo, spec, dt):
    """XLA path: per-trigger windowed logic on materialized traces."""
    if spec.kind == "high_low":
        tts = triggers.get_high_low_triggers(
            traces, th_hi[..., None], th_lo[..., None],
            spec.n_bins_hl * dt, dt)
    else:
        tts = triggers.get_threshold_triggers(traces, th_hi[..., None])
    return triggers.majority_logic(tts, spec.n_coinc,
                                   spec.n_bins_maj * dt, dt)


@pytest.mark.parametrize("C,n_coinc", [(1, 1), (3, 2)])
def test_fused_matches_xla(C, n_coinc):
    rng = np.random.RandomState(7)
    G, n_base = 16, 256
    F = n_base // 2 + 1
    fs, dt = 2.0, 0.5
    spec_re = rng.randn(G * C, F).astype(np.float32)
    spec_im = rng.randn(G * C, F).astype(np.float32)
    I_r, I_i = _irfft_matrices(n_base)
    scale = fs / np.sqrt(2.0)
    traces = ((spec_re @ I_r + spec_im @ I_i) * scale).astype(np.float32)
    traces = traces.reshape(G, C, n_base)

    # per-group thresholds spanning [0.55, 1.15] x the group's own peak so
    # a nontrivial fraction of groups sits on each side of the decision
    peak = np.max(np.abs(traces), axis=(1, 2))                    # [G]
    hi_g = (peak * np.linspace(0.55, 1.15, G)).astype(np.float32)
    specs = (
        TriggerSpecStatic("high_low", n_bins_hl=10, n_bins_maj=64,
                          n_coinc=n_coinc),
        TriggerSpecStatic("simple_threshold", n_bins_hl=1, n_bins_maj=32,
                          n_coinc=n_coinc),
    )
    hi_rows = np.repeat(hi_g, C)
    th_hi = np.stack([hi_rows] * len(specs), axis=-1)
    th_lo = -th_hi

    fired, first, amp = fused_irfft_trigger(
        jnp.asarray(spec_re), jnp.asarray(spec_im),
        jnp.asarray(th_hi), jnp.asarray(th_lo), I_r, I_i,
        scale=scale, triggers=specs, C=C, row_tile=8 * C)
    fired, first, amp = np.asarray(fired), np.asarray(first), np.asarray(amp)

    np.testing.assert_allclose(
        amp, np.max(np.abs(traces), axis=-1), rtol=1e-6)
    for t, spec in enumerate(specs):
        th_gc = jnp.asarray(np.broadcast_to(hi_g[:, None], (G, C)))
        ref_trig, _, ref_first = _reference(
            jnp.asarray(traces), th_gc, -th_gc, spec, dt)
        ref_trig, ref_first = np.asarray(ref_trig), np.asarray(ref_first)
        assert ref_trig.any() and not ref_trig.all(), "degenerate test"
        np.testing.assert_array_equal(fired[:, t], ref_trig, err_msg=spec.kind)
        np.testing.assert_array_equal(first[:, t], ref_first,
                                      err_msg=spec.kind)


def test_fused_pads_nondivisible_f():
    """F_base=129 pads to 256 internally; zero-padding must not change the
    trace (spot-check vs numpy irfft)."""
    rng = np.random.RandomState(3)
    G, n_base = 8, 256
    F = n_base // 2 + 1
    spec = (rng.randn(G, F) + 1j * rng.randn(G, F)).astype(np.complex64)
    I_r, I_i = _irfft_matrices(n_base)
    specs = (TriggerSpecStatic("simple_threshold", 1, 16, 1),)
    th = np.full((G, 1), 1e9, np.float32)  # never fires
    fired, first, amp = fused_irfft_trigger(
        jnp.asarray(spec.real), jnp.asarray(spec.imag),
        jnp.asarray(th), jnp.asarray(-th), I_r, I_i,
        scale=1.0, triggers=specs, C=1, row_tile=8)
    ref = np.fft.irfft(spec, n=n_base, axis=-1)
    np.testing.assert_allclose(np.asarray(amp)[:, 0],
                               np.max(np.abs(ref), axis=-1), rtol=1e-4)
    assert not np.asarray(fired).any()
    np.testing.assert_array_equal(np.asarray(first)[:, 0], 0)
