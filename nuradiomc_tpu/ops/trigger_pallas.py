"""Pallas TPU kernel: fused trigger-trace irfft + high/low trigger reduction.

The XLA trigger path materializes the [G*C, n_base] channel traces in HBM
(the irfft-matmul write), re-reads them for max-amplitude, and then streams
~12 boolean shift-OR passes over [G, C, n_base] windows
(`ops/triggers._sliding_window_any`) — measured round-4 at 3.5 ms (irfft)
+ 11.6 ms (high-low windows) of the 66 ms bench step, at only ~11% of HBM
peak. This kernel keeps the trace tile in VMEM:

  per row tile (rows = (group, channel), channel fastest):
    1. MXU: trace = Re(X) @ I_r + Im(X) @ I_i, accumulated over F tiles
       (the irfft is real-linear in (Re, Im), pipeline._irfft_matrices)
    2. VPU, on the resident tile: per-trigger high/low (or |V|) crossings,
       sliding-window-any via log2(window) roll+mask ORs, cross-channel
       majority count, first-bin argmin — all without touching HBM
  outputs: triggered [G, T] int32, first_bin [G, T] int32 and
           max|trace| [G*C, 1] f32 — ~20 bytes per row instead of the
           8 KB trace row.

Semantics are bit-identical to ops.triggers.get_high_low_triggers /
get_threshold_triggers + majority_logic (strict >=/<= comparisons, left
zero padding, argmax first-bin); equivalence is pinned by
tests/test_trigger_pallas.py in CPU interpret mode and by the bench
conformance probe on the chip. Select with
PipelineSettings(trigger_impl="pallas"); float32 only.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TriggerSpecStatic:
    """Static per-trigger parameters baked into the kernel."""

    kind: str            # 'high_low' | 'simple_threshold'
    n_bins_hl: int       # within-channel coincidence window (bins)
    n_bins_maj: int      # cross-channel coincidence window (bins)
    n_coinc: int         # number of channels required


def _swa(x, window: int, col_ids):
    """Sliding-window-any with left zero padding (triggers.py:27-44):
    out[i] = any(x[i-window+1 .. i]), as log2(window) roll+mask ORs on the
    VMEM-resident tile. ``x`` is an int32 0/1 mask (Mosaic cannot rotate
    1-bit vectors); ``col_ids`` is a broadcasted iota over the lane dim."""
    from jax.experimental.pallas import tpu as pltpu

    out = x
    covered = 1
    while covered < window:
        s = min(covered, window - covered)
        shifted = pltpu.roll(out, shift=s, axis=out.ndim - 1)
        # zero-fill the wrap-around (left zero padding semantics)
        shifted = jnp.where(col_ids >= s, shifted, 0)
        out = jnp.bitwise_or(out, shifted)
        covered += s
    return out


def _kernel(sr_ref, si_ref, thhi_ref, thlo_ref, ir_ref, ii_ref,
            trig_ref, first_ref, amp_ref, acc_ref, *,
            scale: float, triggers: Tuple[TriggerSpecStatic, ...],
            C: int, n_base: int, f_tiles: int, mm_dtype=jnp.float32):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += (
        jnp.dot(sr_ref[:].astype(mm_dtype), ir_ref[:].astype(mm_dtype),
                preferred_element_type=jnp.float32)
        + jnp.dot(si_ref[:].astype(mm_dtype), ii_ref[:].astype(mm_dtype),
                  preferred_element_type=jnp.float32))

    @pl.when(j == f_tiles - 1)
    def _():
        v = acc_ref[:] * jnp.float32(scale)          # [rows, n_base]
        rows = v.shape[0]
        tile_g = rows // C
        amp_ref[:] = jnp.max(jnp.abs(v), axis=-1, keepdims=True)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, n_base), 1)
        col_ids_g = jax.lax.broadcasted_iota(jnp.int32, (tile_g, n_base), 1)
        fired_cols, first_cols = [], []
        for t, spec in enumerate(triggers):
            th_hi = thhi_ref[:, t][:, None]
            if spec.kind == "high_low":
                hi = _swa((v >= th_hi).astype(jnp.int32), spec.n_bins_hl,
                          col_ids)
                lo = _swa((v <= thlo_ref[:, t][:, None]).astype(jnp.int32),
                          spec.n_bins_hl, col_ids)
                tts = jnp.bitwise_and(hi, lo)
            else:                                    # simple_threshold
                tts = (jnp.abs(v) >= th_hi).astype(jnp.int32)
            # majority_logic (triggers.py:62-83): widen, count channels,
            # compare, first bin = argmax
            wid = _swa(tts, min(spec.n_bins_maj, n_base), col_ids)
            if C == 1:
                cnt = wid.reshape(tile_g, n_base)
            else:
                cnt = jnp.sum(wid.reshape(tile_g, C, n_base), axis=1)
            ttt = cnt >= spec.n_coinc
            fired = jnp.any(ttt, axis=-1)
            first = jnp.min(jnp.where(ttt, col_ids_g, n_base), axis=-1)
            fired_cols.append(fired.astype(jnp.int32))
            first_cols.append(jnp.where(fired, first, 0))
        # one full-block store per output (Mosaic handles whole-ref stores
        # more robustly than strided column writes)
        trig_ref[:] = jnp.stack(fired_cols, axis=-1)
        first_ref[:] = jnp.stack(first_cols, axis=-1)


def fused_irfft_trigger(spec_re, spec_im, th_hi, th_lo, I_r, I_i, *,
                        scale: float,
                        triggers: Tuple[TriggerSpecStatic, ...],
                        C: int, row_tile: int = 128, f_tile: int = 128,
                        matmul_dtype=jnp.float32):
    """Fused irfft-matmul + trigger evaluation.

    spec_re/spec_im : [R, F_base] f32 — filtered rFFT spectra, rows ordered
        (group, channel) with channel fastest; R = G * C.
    th_hi/th_lo : [R, T] f32 absolute thresholds per row and trigger
        (th_lo ignored for simple_threshold columns).
    I_r, I_i : [F_base, n_base] numpy irfft matrices
        (pipeline._irfft_matrices).
    scale : trace scale (sampling_rate / sqrt(2)).

    Returns (triggered [G, T] bool, first_bin [G, T] i32, amp [G, C] f32).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, F_base = spec_re.shape
    n_base = I_r.shape[1]
    T = len(triggers)
    G = R // C
    assert R == G * C

    # pad the contraction dim to a multiple of f_tile (zero rows of I and
    # zero spectrum columns contribute nothing; XLA fuses the pad into the
    # spectrum producer)
    F_pad = -(-F_base // f_tile) * f_tile
    if F_pad != F_base:
        spec_re = jnp.pad(spec_re, ((0, 0), (0, F_pad - F_base)))
        spec_im = jnp.pad(spec_im, ((0, 0), (0, F_pad - F_base)))
        I_r = np.pad(np.asarray(I_r), ((0, F_pad - F_base), (0, 0)))
        I_i = np.pad(np.asarray(I_i), ((0, F_pad - F_base), (0, 0)))
    f_tiles = F_pad // f_tile

    # shrink the row tile until it divides R (keeping whole groups per tile)
    while row_tile > C and (R % row_tile or row_tile % C):
        row_tile //= 2
    if R % row_tile or row_tile % C:
        row_tile = C
    grid = (R // row_tile, f_tiles)
    tile_g = row_tile // C

    kernel = functools.partial(
        _kernel, scale=float(scale), triggers=tuple(triggers), C=C,
        n_base=int(n_base), f_tiles=f_tiles, mm_dtype=matmul_dtype)

    trig, first, amp = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, f_tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, f_tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, T), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, T), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_tile, n_base), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_tile, n_base), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_g, T), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_g, T), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, T), jnp.int32),
            jax.ShapeDtypeStruct((G, T), jnp.int32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((row_tile, n_base), jnp.float32)],
    )(spec_re, spec_im, th_hi, th_lo,
      jnp.asarray(I_r, matmul_dtype), jnp.asarray(I_i, matmul_dtype))
    return trig > 0, first, amp.reshape(G, C)
