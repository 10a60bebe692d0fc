"""Isolated A/B of placement-kernel epilogue variants on the chip.

The round-4 stage table puts the fused placement kernel at 27.8 ms/step
isolated while its 4 DFT matmuls would cost ~6 ms at the MXU rate the
trigger irfft demonstrably achieves (156 TFLOP/s) — the epilogue (phase
outer product, complex multiply, reshape-sum reduction) is suspected of
starving the MXU. Each variant here isolates one epilogue ingredient on
synthetic on-device data at the bench shape (R=262144, F_int=257,
F_base=1025, s2=4), fori(k=5)-vs-k=1 differenced:

    python -u tools/profile_placement_variants.py
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import _enable_compilation_cache

_enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, F_INT, F_BASE, S2 = 262144, 257, 1025, 4
DF = 2.0 / 2048.0
K_HI, K_LO, N_BLOCKS = 5, 1, 3
_BLOCK = 128


def _phase(off_col, r_t, f_base):
    theta = jnp.asarray(-2.0 * np.pi * DF, jnp.float32) * off_col[:, 0]
    n_hi = -(-f_base // _BLOCK)
    b = jax.lax.broadcasted_iota(jnp.int32, (r_t, _BLOCK), 1).astype(jnp.float32)
    a = (jax.lax.broadcasted_iota(jnp.int32, (r_t, n_hi), 1)
         .astype(jnp.float32) * _BLOCK)
    tb = theta[:, None] * b
    ta = theta[:, None] * a
    wb_re, wb_im = jnp.cos(tb), jnp.sin(tb)
    wa_re, wa_im = jnp.cos(ta), jnp.sin(ta)
    ph_re = (wa_re[:, :, None] * wb_re[:, None, :]
             - wa_im[:, :, None] * wb_im[:, None, :]).reshape(r_t, n_hi * _BLOCK)
    ph_im = (wa_re[:, :, None] * wb_im[:, None, :]
             + wa_im[:, :, None] * wb_re[:, None, :]).reshape(r_t, n_hi * _BLOCK)
    return ph_re[:, :f_base], ph_im[:, :f_base]


def _kernel(vr_ref, vi_ref, off_ref, drr_ref, dri_ref, dir_ref, dii_ref,
            red_ref, out_re_ref, out_im_ref, *, s2, f_base, variant):
    vr = vr_ref[:]
    vi = vi_ref[:]
    xb_re = (jnp.dot(vr, drr_ref[:], preferred_element_type=jnp.float32)
             + jnp.dot(vi, dir_ref[:], preferred_element_type=jnp.float32))
    xb_im = (jnp.dot(vr, dri_ref[:], preferred_element_type=jnp.float32)
             + jnp.dot(vi, dii_ref[:], preferred_element_type=jnp.float32))
    r_t = vr.shape[0]
    f = xb_re.shape[-1]

    if variant == "matmul_only":
        # no phase, reduction via reshape-sum (measures MXU floor + store)
        y_re, y_im = xb_re, xb_im
    elif variant.startswith("sliced"):
        # phase multiply per static 128-wide lane slice: no [r,9,128] 3D
        # intermediates, no sublane->lane reshape — only 2D [r,128] ops
        theta = jnp.asarray(-2.0 * np.pi * DF, jnp.float32) * off_ref[:, 0]
        b = jax.lax.broadcasted_iota(jnp.int32, (r_t, _BLOCK), 1).astype(jnp.float32)
        tb = theta[:, None] * b
        wb_re, wb_im = jnp.cos(tb), jnp.sin(tb)
        n_hi = -(-f_base // _BLOCK)
        parts_re, parts_im = [], []
        for a in range(n_hi):
            ta = theta * jnp.float32(a * _BLOCK)
            wa_re, wa_im = jnp.cos(ta)[:, None], jnp.sin(ta)[:, None]
            pr = wa_re * wb_re - wa_im * wb_im
            pi = wa_re * wb_im + wa_im * wb_re
            lo = a * _BLOCK
            w = min(_BLOCK, f - lo)
            xr = xb_re[:, lo:lo + w]
            xi = xb_im[:, lo:lo + w]
            parts_re.append(xr * pr[:, :w] - xi * pi[:, :w])
            parts_im.append(xr * pi[:, :w] + xi * pr[:, :w])
        y_re = jnp.concatenate(parts_re, axis=-1)
        y_im = jnp.concatenate(parts_im, axis=-1)
    else:
        ph_re, ph_im = _phase(off_ref[:], r_t, f_base)
        y_re = xb_re * ph_re - xb_im * ph_im
        y_im = xb_re * ph_im + xb_im * ph_re

    if variant.endswith("mxu_reduce"):
        # s2 reduction as a static 0/1 matmul (avoids the reshape-sum
        # sublane relayout): out = red @ y, red [r_t//s2, r_t]
        out_re_ref[:] = jnp.dot(red_ref[:], y_re,
                                preferred_element_type=jnp.float32)
        out_im_ref[:] = jnp.dot(red_ref[:], y_im,
                                preferred_element_type=jnp.float32)
    else:
        out_re_ref[:] = jnp.sum(y_re.reshape(r_t // s2, s2, f), axis=1)
        out_im_ref[:] = jnp.sum(y_im.reshape(r_t // s2, s2, f), axis=1)


def build(variant, row_tile):
    out_tile = row_tile // S2
    red = np.zeros((out_tile, row_tile), np.float32)
    for g in range(out_tile):
        red[g, g * S2:(g + 1) * S2] = 1.0
    kernel = functools.partial(_kernel, s2=S2, f_base=F_BASE, variant=variant)
    row_spec = pl.BlockSpec((row_tile, F_INT), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)

    def call(vr, vi, off, drr, dri, dir_, dii):
        return pl.pallas_call(
            kernel,
            interpret=jax.default_backend() != "tpu",
            grid=(R // row_tile,),
            in_specs=[row_spec, row_spec,
                      pl.BlockSpec((row_tile, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      full((F_INT, F_BASE)), full((F_INT, F_BASE)),
                      full((F_INT, F_BASE)), full((F_INT, F_BASE)),
                      full((out_tile, row_tile))],
            out_specs=(pl.BlockSpec((out_tile, F_BASE), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((out_tile, F_BASE), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((R // S2, F_BASE), jnp.float32),
                       jax.ShapeDtypeStruct((R // S2, F_BASE), jnp.float32)),
        )(vr, vi, off, drr, dri, dir_, dii, jnp.asarray(red))

    return call


def main():
    rng = np.random.RandomState(0)
    # inputs synthesized ON DEVICE inside the jit (axon tunnel arg limits)
    dr = rng.randn(F_INT, F_BASE).astype(np.float32)
    di = rng.randn(F_INT, F_BASE).astype(np.float32)

    variants = [
        ("baseline rt=256", "baseline", 256),
        ("baseline rt=128", "baseline", 128),
        ("matmul_only rt=256 (no phase: MXU+reduce floor)", "matmul_only", 256),
        ("mxu_reduce rt=256 (reduction on MXU)", "mxu_reduce", 256),
        ("mxu_reduce rt=128", "mxu_reduce", 128),
        ("sliced_phase rt=256 (2D lane-slice phase)", "sliced", 256),
        ("sliced_phase + mxu_reduce rt=256", "sliced_mxu_reduce", 256),
    ]
    for name, variant, row_tile in variants:
        try:
            _run_variant(name, variant, row_tile, dr, di)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:200]}),
                  flush=True)


def _run_variant(name, variant, row_tile, dr, di):
        call = build(variant, row_tile)

        def make(k):
            def block(seed):
                def body(i, acc):
                    key = jax.random.fold_in(jax.random.key(0, impl="rbg"), i + seed)
                    vr = jax.random.normal(key, (R, F_INT), jnp.float32)
                    vi = vr * 0.5
                    off = jax.random.uniform(key, (R, 1), jnp.float32) * 500.0
                    o_re, o_im = call(vr, vi, off, dr, di, dr, di)
                    return acc + o_re[0, 0] + o_im[-1, -1]
                return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
            return block

        times = {}
        for k in (K_LO, K_HI):
            fn = jax.jit(make(k))
            float(fn(jnp.int32(0)))
            best = np.inf
            for _ in range(N_BLOCKS):
                t0 = time.perf_counter()
                float(fn(jnp.int32(0)))
                best = min(best, time.perf_counter() - t0)
            times[k] = best
        t = (times[K_HI] - times[K_LO]) / (K_HI - K_LO)
        print(json.dumps({"variant": name, "ms_per_step": round(t * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
