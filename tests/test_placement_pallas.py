"""Fused Pallas placement kernel == the XLA einsum + phase + reduce path
(pipeline stage 7), in interpreter mode on the CPU host.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nuradiomc_tpu.ops import placement_pallas
from nuradiomc_tpu.ops import trace as trace_ops
from nuradiomc_tpu.sim import pipeline


def test_kernel_matches_xla_path():
    G, S, C = 8, 2, 1
    N_INT, N_BASE = 64, 256
    F_INT, F_BASE = N_INT // 2 + 1, N_BASE // 2 + 1
    fs = 2.0
    df = fs / N_BASE

    rng = np.random.default_rng(4)
    V = (rng.standard_normal((G, S, C, 2, F_INT))
         + 1j * rng.standard_normal((G, S, C, 2, F_INT))).astype(np.complex64)
    offset = rng.uniform(0, 300, (G, S, C, 2)).astype(np.float32)

    D_r, D_i = pipeline._placement_matrices(N_INT, N_BASE)

    # XLA reference path
    Xb = (np.einsum("gscrf,fk->gscrk", V.real, D_r)
          + np.einsum("gscrf,fk->gscrk", V.imag, D_i))
    ph = np.asarray(trace_ops.time_shift_phase_uniform(
        F_BASE, np.float32(df), jnp.asarray(offset)))
    ref = np.sum(Xb * ph, axis=(1, 3))                   # [G, C, F_BASE]

    # Pallas kernel (channel-major rows, (s, r) fastest)
    s2 = S * 2
    Vt = np.moveaxis(V, 2, 1).reshape(G * C * s2, F_INT)
    offs = np.moveaxis(offset, 2, 1).reshape(-1)
    out_re, out_im = placement_pallas.placement_reduce(
        jnp.asarray(Vt.real), jnp.asarray(Vt.imag), jnp.asarray(offs),
        D_r, D_i, s2=s2, df=float(df), row_tile=2 * s2)
    # output is lane-padded to a 128 multiple; padded columns must be zero
    np.testing.assert_array_equal(np.asarray(out_re)[:, F_BASE:], 0.0)
    got = (np.asarray(out_re)[:, :F_BASE]
           + 1j * np.asarray(out_im)[:, :F_BASE]).reshape(G, C, F_BASE)

    scale = np.abs(ref).max()
    # the kernel's 128-wide phase tables round differently from the
    # reference path's 32-wide ones at f32 (~1e-4 relative)
    np.testing.assert_allclose(got, ref, atol=5e-4 * scale, rtol=0)


def test_v3_phase_modes_match_table():
    """'bitprod' and 'input' phase-table constructions == 'table' to a few
    ulps (the b-table values differ only by chained-multiply rounding)."""
    rng = np.random.default_rng(3)
    T = 16
    theta = jnp.asarray(rng.uniform(-3, 3, (T, 1)).astype(np.float32))
    ref_re, ref_im = placement_pallas._phase_b_table(theta, T, "table")
    got_re, got_im = placement_pallas._phase_b_table(theta, T, "bitprod")
    # |w| == 1; the dominant delta is the TABLE side: f32 cos(theta*b) at
    # |arg| up to ~400 rad carries ~|arg|*ulp argument-reduction error
    # (~2e-5), while bitprod multiplies small-angle values. Unit-modulus
    # check pins bitprod's own drift to ~1e-6.
    np.testing.assert_allclose(np.asarray(got_re), np.asarray(ref_re),
                               atol=1e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(got_im), np.asarray(ref_im),
                               atol=1e-4, rtol=0)
    # repeated squaring compounds: ~2^6 ulps after the 6 squarings
    mod = np.asarray(got_re) ** 2 + np.asarray(got_im) ** 2
    np.testing.assert_allclose(mod, 1.0, atol=3e-5, rtol=0)


def test_chain_v3_matches_v2():
    """v3 (flat epilogue, grid-accumulated reduction) == v2 bitwise-ish on
    random factored-chain inputs (interpreter mode)."""
    G, C, S = 16, 2, 2
    s2 = S * 2
    R = G * C * s2
    F_INT, F_BASE = 33, 129
    N_SPARSE, N_TPL = 8, C * 3
    rng = np.random.default_rng(7)
    f32 = lambda *sh: rng.standard_normal(sh).astype(np.float32)
    spec_re, spec_im = f32(R, F_INT), f32(R, F_INT)
    att_sparse = f32(R, N_SPARSE)
    comb_re, comb_im = f32(R), f32(R)
    mask = (rng.uniform(size=R) > 0.2).astype(np.float32)
    tpl_idx = rng.integers(0, N_TPL, R).astype(np.int32)
    offsets = rng.uniform(0, 300, R).astype(np.float32)
    W = f32(N_SPARSE, F_INT)
    templates = (f32(N_TPL, F_INT) + 1j * f32(N_TPL, F_INT)
                 ).astype(np.complex64)
    D_r = (f32(F_INT, F_BASE) + 1j * f32(F_INT, F_BASE)).astype(np.complex64)
    D_i = (f32(F_INT, F_BASE) + 1j * f32(F_INT, F_BASE)).astype(np.complex64)
    df = 2.0 / 256

    kw = dict(s2=s2, df=df, n_templates=N_TPL)
    a2 = placement_pallas.chain_placement_reduce(
        *map(jnp.asarray, (spec_re, spec_im, att_sparse, comb_re, comb_im,
                           mask, tpl_idx, offsets, W, templates, D_r, D_i)),
        row_tile=4 * s2, **kw)
    a3 = placement_pallas.chain_placement_reduce_v3(
        *map(jnp.asarray, (spec_re, spec_im, att_sparse, comb_re, comb_im,
                           mask, tpl_idx, offsets, W, templates, D_r, D_i)),
        out_tile=8, **kw)
    scale = float(np.abs(np.asarray(a2[0])).max())
    for v2_out, v3_out in zip(a2, a3):
        # identical per-element op order; only the s2-sum association differs
        np.testing.assert_allclose(np.asarray(v3_out), np.asarray(v2_out),
                                   atol=1e-6 * scale, rtol=0)
    np.testing.assert_array_equal(np.asarray(a3[0])[:, F_BASE:], 0.0)

    # alternative phase-table constructions: few-ulp table deltas only
    for mode in ("bitprod", "input"):
        am = placement_pallas.chain_placement_reduce_v3(
            *map(jnp.asarray, (spec_re, spec_im, att_sparse, comb_re,
                               comb_im, mask, tpl_idx, offsets, W,
                               templates, D_r, D_i)),
            out_tile=8, phase_mode=mode, **kw)
        for v2_out, vm_out in zip(a2, am):
            np.testing.assert_allclose(np.asarray(vm_out),
                                       np.asarray(v2_out),
                                       atol=2e-4 * scale, rtol=0)


@pytest.mark.parametrize("impl", ["pallas", "pallas_v1", "pallas_v2",
                                  "pallas_v3"])
def test_pipeline_flag_equivalence(impl):
    """simulate_batch(placement_impl='pallas'|'pallas_v1') == 'xla' at
    float32 on a small batch (interpreter mode). 'pallas_v1' is the
    materialize-volt + v1-kernel hybrid (XLA builds volt_spec, the kernel
    does only DFT placement + phase + reduction)."""
    import dataclasses

    import sys
    sys.path.insert(0, ".")
    from __graft_entry__ import _make_settings_and_inputs
    from nuradiomc_tpu.sim.pipeline import simulate_batch

    settings, ch, batch = _make_settings_and_inputs(
        n_groups=8, n_showers=2, n_channels=2, n_internal=128, n_base=256)
    s_pl = dataclasses.replace(settings, placement_impl=impl)

    out_x = jax.jit(lambda b: simulate_batch(b, ch, settings,
                                             keep_traces=True))(batch)
    out_p = jax.jit(lambda b: simulate_batch(b, ch, s_pl,
                                             keep_traces=True))(batch)

    np.testing.assert_array_equal(np.asarray(out_x.triggered),
                                  np.asarray(out_p.triggered))
    scale = float(np.abs(np.asarray(out_x.traces)).max())
    np.testing.assert_allclose(np.asarray(out_p.traces),
                               np.asarray(out_x.traces),
                               atol=3e-6 * scale, rtol=0)


def test_pipeline_flag_equivalence_phased_array():
    """The phased-array trigger path consumes the kernel-produced channel
    spectra (decimating-matmul branch): pallas == xla decisions."""
    import dataclasses
    import sys

    sys.path.insert(0, ".")
    from __graft_entry__ import _make_settings_and_inputs
    from nuradiomc_tpu.ops import phased_array
    from nuradiomc_tpu.sim.pipeline import simulate_batch

    settings, ch, batch = _make_settings_and_inputs(
        n_groups=8, n_showers=2, n_channels=4, n_internal=128, n_base=512)
    rolls = phased_array.beam_rolls(
        np.asarray(ch.positions)[:, 2], np.asarray(ch.cable_delays),
        phased_array.default_angles, 1.75, 1.0)
    pa = dict(trigger_type="phased_array",
              pa_rolls=tuple(tuple(int(v) for v in r) for r in rolls),
              pa_window=16, pa_step=8, pa_upsampling=2,
              pa_threshold=1e-12, pa_digitize=True, pa_adc_fs=0.5,
              pa_adc_nbits=8, pa_adc_range=1e-4)
    s_x = dataclasses.replace(settings, **pa)
    s_p = dataclasses.replace(s_x, placement_impl="pallas")

    out_x = jax.jit(lambda b: simulate_batch(b, ch, s_x))(batch)
    out_p = jax.jit(lambda b: simulate_batch(b, ch, s_p))(batch)
    np.testing.assert_array_equal(np.asarray(out_x.triggered),
                                  np.asarray(out_p.triggered))
    assert np.asarray(out_x.triggered).any()
