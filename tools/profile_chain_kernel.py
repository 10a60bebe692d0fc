"""Isolated A/B of the REAL placement kernels (v1 vs v2 chain) on chip.

The stop-after ladder attributes 42.5 ms/step to the v2 chain kernel
in-context, while the synthetic variant harness puts a v1-shaped kernel
at 14.9 ms with an 11.15 ms matmul floor (tools/
profile_placement_variants.py, 2026-08-19). This measures the actual
library entry points (ops/placement_pallas.py) on synthetic on-device
inputs at the bench shape to locate the missing ~25 ms: the v2 kernel
body itself, or the XLA prep feeding it.

    python -u tools/profile_chain_kernel.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import _enable_compilation_cache

_enable_compilation_cache()

import jax
import jax.numpy as jnp

from nuradiomc_tpu.ops import placement_pallas

G, S2, F_INT, F_BASE = 65536, 4, 257, 1025
R = G * S2
N_SPARSE, N_TPL = 16, 3
DF = 2.0 / 2048.0
K_HI, K_LO, N_BLOCKS = 5, 1, 3


def timed(name, make):
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


def main():
    rng = np.random.RandomState(0)
    dr = (rng.randn(F_INT, F_BASE) + 1j * rng.randn(F_INT, F_BASE)).astype(
        np.complex64)
    di = (rng.randn(F_INT, F_BASE) + 1j * rng.randn(F_INT, F_BASE)).astype(
        np.complex64)
    w = rng.rand(N_SPARSE, F_INT).astype(np.float32)
    tpl = (rng.randn(N_TPL, F_INT) + 1j * rng.randn(N_TPL, F_INT)).astype(
        np.complex64)

    def inputs(i):
        key = jax.random.fold_in(jax.random.key(0, impl="rbg"), i)
        sr = jax.random.normal(key, (R, F_INT), jnp.float32)
        si = sr * 0.5
        off = jax.random.uniform(key, (R,), jnp.float32) * 500.0
        att = jax.random.uniform(key, (R, N_SPARSE), jnp.float32)
        cr = jax.random.normal(key, (R,), jnp.float32)
        ci = cr * 0.25
        mask = (cr > -1.0).astype(jnp.float32)
        tidx = (jnp.abs(cr * 1000).astype(jnp.int32)) % N_TPL
        return sr, si, off, att, cr, ci, mask, tidx

    def make_v1(k):
        def block(seed):
            def body(i, acc):
                sr, si, off, *_ = inputs(i + seed)
                o_re, o_im = placement_pallas.placement_reduce(
                    sr, si, off, dr, di, s2=S2, df=DF, row_tile=256)
                return acc + o_re[0, 0] + o_im[-1, -1]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return block

    def make_v2(k):
        def block(seed):
            def body(i, acc):
                sr, si, off, att, cr, ci, mask, tidx = inputs(i + seed)
                o_re, o_im = placement_pallas.chain_placement_reduce(
                    sr, si, att, cr, ci, mask, tidx, off, w, tpl, dr, di,
                    s2=S2, df=DF, n_templates=N_TPL, row_tile=256)
                return acc + o_re[0, 0] + o_im[-1, -1]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return block

    timed("real v1 placement_reduce rt=256", make_v1)
    timed("real v2 chain_placement_reduce rt=256", make_v2)


if __name__ == "__main__":
    main()
