"""Pallas TPU kernel: fused phased-array trigger chain.

The XLA phased-array path (pipeline._eval_trigger, trigger_type ==
'phased_array') streams five HBM-sized intermediates per step: the
decimated ADC trace, the quantized trace, the x2-upsampled trace, the
[.., B, n_up] coherent beam sums and their sliding power sums
(phasedArrayBase.py:183-271 semantics). All of it is per-row linear
algebra + elementwise logic, so this kernel keeps the whole chain in
VMEM per row tile (rows = (group, channel), channel fastest):

  1. MXU, accumulated over F tiles:
       full  = Re(X) @ I_r  + Im(X) @ I_i    (n_base trace - max-amp)
       dec   = Re(X) @ Dd_r + Im(X) @ Dd_i   (5 GHz resample + stride
                                              decimate to the ADC rate,
                                              pipeline._decimating_irfft_matrices)
  2. VPU/MXU epilogue on the resident tile:
       quantize (perfect floor comparator, ops/adc.py:14-35)
       upsample x2 as one [n_dec, n_up] matmul (pipeline._fft_upsample_matrix)
       11 coherent beams via static-integer pltpu.roll + adds
       window-w/step-s power sums as a roll-doubling sliding sum
       threshold compare on the reference's frame grid
  outputs: triggered [G, 1] i32, first frame [G, 1] i32, max|trace| [R, 1].

Numerics note: the sliding power sum is a doubling tree, the XLA path a
cumsum difference — identical in exact arithmetic, ~1e-7-relative apart
at f32, so frame-boundary decisions can differ on razor-thin margins; the
phased-array conformance targets are statistical (noise RNGs differ from
the reference anyway, tests/test_e2e_phased_array.py docstring).
Equivalence at tolerance + decision equality on non-degenerate margins is
pinned by tests/test_pa_pallas.py in CPU interpret mode. Select with
PipelineSettings(trigger_impl="pallas") on a phased-array trigger with
pa_digitize=True; float32 only.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _sliding_sum_fwd(x, window: int):
    """s[i] = sum(x[i .. i+window-1]) by shift-doubling (wrap-around
    contaminates only i > n-window, never read: the frame grid stops at
    (num_frames-1)*step <= n-window)."""
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[-1]
    out = x
    covered = 1
    while covered < window:
        s = min(covered, window - covered)
        out = out + pltpu.roll(out, shift=n - s, axis=out.ndim - 1)
        covered += s
    return out


def _kernel(sr_ref, si_ref, ir_ref, ii_ref, ddr_ref, ddi_ref, u_ref,
            trig_ref, first_ref, amp_ref, accf_ref, accd_ref, *,
            scale_full: float, scale_dec: float,
            rolls: Tuple[Tuple[int, ...], ...],
            threshold: float, window: int, step: int,
            v_min: float, lsb: float, n_counts: int,
            C: int, n_up: int, f_tiles: int, mm_dtype=jnp.float32):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        accf_ref[:] = jnp.zeros_like(accf_ref)
        accd_ref[:] = jnp.zeros_like(accd_ref)

    sr = sr_ref[:].astype(mm_dtype)
    si = si_ref[:].astype(mm_dtype)
    accf_ref[:] += (
        jnp.dot(sr, ir_ref[:].astype(mm_dtype),
                preferred_element_type=jnp.float32)
        + jnp.dot(si, ii_ref[:].astype(mm_dtype),
                  preferred_element_type=jnp.float32))
    accd_ref[:] += (
        jnp.dot(sr, ddr_ref[:].astype(mm_dtype),
                preferred_element_type=jnp.float32)
        + jnp.dot(si, ddi_ref[:].astype(mm_dtype),
                  preferred_element_type=jnp.float32))

    @pl.when(j == f_tiles - 1)
    def _():
        rows = accf_ref.shape[0]
        tile_g = rows // C
        amp_ref[:] = jnp.max(jnp.abs(accf_ref[:] * jnp.float32(scale_full)),
                             axis=-1, keepdims=True)

        # ADC: perfect floor comparator with saturation (ops/adc.py)
        tr = accd_ref[:] * jnp.float32(scale_dec)
        counts = jnp.floor((tr - v_min) * jnp.float32(1.0 / lsb))
        counts = jnp.clip(counts, 0.0, float(n_counts - 1))
        counts = counts + float(np.floor(v_min / lsb))
        q = counts * jnp.float32(lsb)                     # [rows, n_dec]

        # FFT upsample x2 as a matmul, then static-roll coherent beams
        up = jnp.dot(q, u_ref[:], preferred_element_type=jnp.float32)
        up3 = up.reshape(tile_g, C, n_up)
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_g, n_up), 1)
        num_frames = (n_up - window) // step
        frame_mask = (col % step == 0) & (col < num_frames * step)
        thr_sum = jnp.float32(threshold * window)

        any_above = jnp.zeros((tile_g, n_up), jnp.int32)
        for b in range(len(rolls)):
            beam = jnp.zeros((tile_g, n_up), jnp.float32)
            for c in range(C):
                r = int(rolls[b][c]) % n_up
                beam = beam + pltpu.roll(up3[:, c, :], shift=r, axis=1)
            power = _sliding_sum_fwd(beam * beam, window)
            any_above = jnp.bitwise_or(
                any_above, (power > thr_sum).astype(jnp.int32))
        above = jnp.bitwise_and(any_above,
                                frame_mask.astype(jnp.int32)) > 0
        fired = jnp.any(above, axis=-1)
        first_col = jnp.min(jnp.where(above, col, n_up), axis=-1)
        trig_ref[:] = fired.astype(jnp.int32)[:, None]
        first_ref[:] = jnp.where(fired, first_col // step, 0)[:, None]


def fused_pa_trigger(spec_re, spec_im, I_r, I_i, Dd_r, Dd_i, U, *,
                     scale_full: float, scale_dec: float,
                     rolls, threshold: float, window: int, step: int,
                     v_min: float, lsb: float, n_counts: int,
                     C: int, row_tile: int = 128, f_tile: int = 128,
                     matmul_dtype=jnp.float32):
    """Fused irfft + ADC + upsample + beamform + power trigger.

    spec_re/spec_im : [R, F_base] f32 — filtered (noise-added) channel
        spectra, rows (group, channel) with channel fastest; R = G * C.
    I_r/I_i : [F_base, n_base] full irfft matrices (max-amp trace).
    Dd_r/Dd_i : [F_base, n_dec] decimating irfft matrices.
    U : [n_dec, n_up] FFT-upsampling matrix.
    rolls : static (B, C) integer beam delays (ops/phased_array.beam_rolls).

    Returns (triggered [G] bool, first_frame [G] i32, amp [G, C] f32).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, F_base = spec_re.shape
    n_base = I_r.shape[1]
    n_dec = Dd_r.shape[1]
    n_up = U.shape[1]
    G = R // C
    assert R == G * C

    F_pad = -(-F_base // f_tile) * f_tile
    if F_pad != F_base:
        spec_re = jnp.pad(spec_re, ((0, 0), (0, F_pad - F_base)))
        spec_im = jnp.pad(spec_im, ((0, 0), (0, F_pad - F_base)))
        I_r = np.pad(np.asarray(I_r), ((0, F_pad - F_base), (0, 0)))
        I_i = np.pad(np.asarray(I_i), ((0, F_pad - F_base), (0, 0)))
        Dd_r = np.pad(np.asarray(Dd_r), ((0, F_pad - F_base), (0, 0)))
        Dd_i = np.pad(np.asarray(Dd_i), ((0, F_pad - F_base), (0, 0)))
    f_tiles = F_pad // f_tile

    while row_tile > C and (R % row_tile or row_tile % C):
        row_tile //= 2
    if R % row_tile or row_tile % C:
        row_tile = C
    grid = (R // row_tile, f_tiles)
    tile_g = row_tile // C

    kernel = functools.partial(
        _kernel, scale_full=float(scale_full), scale_dec=float(scale_dec),
        rolls=tuple(tuple(int(x) for x in r) for r in np.asarray(rolls)),
        threshold=float(threshold), window=int(window), step=int(step),
        v_min=float(v_min), lsb=float(lsb), n_counts=int(n_counts),
        C=C, n_up=int(n_up), f_tiles=f_tiles, mm_dtype=matmul_dtype)

    trig, first, amp = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, f_tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, f_tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_tile, n_base), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_tile, n_base), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_tile, n_dec), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_tile, n_dec), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_dec, n_up), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_g, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_g, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, 1), jnp.int32),
            jax.ShapeDtypeStruct((G, 1), jnp.int32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((row_tile, n_base), jnp.float32),
                        pltpu.VMEM((row_tile, n_dec), jnp.float32)],
    )(spec_re, spec_im,
      jnp.asarray(I_r, matmul_dtype), jnp.asarray(I_i, matmul_dtype),
      jnp.asarray(Dd_r, matmul_dtype), jnp.asarray(Dd_i, matmul_dtype),
      jnp.asarray(U, jnp.float32))
    return trig[:, 0] > 0, first[:, 0], amp.reshape(G, C)
