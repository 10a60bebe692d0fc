"""Why does the v2 chain kernel cost 41 ms in-context but 15.6 isolated?

Ladder r4b (2026-08-19): prep (placeprep anchor) 2.5 ms, kernel-in-context
41 ms; tools/profile_chain_kernel.py puts the same kernel at 15.6 ms on
rbg-generated operands. This matrix varies the operand PRODUCER and the
calling program to find the 25 ms:

  A. isolated v2, rbg operands (control, expect ~15.6)
  B. isolated v2, operands produced the pipeline's way: complex64
     [G,S,1,2,F] source -> .real/.imag -> moveaxis -> reshape (layout/
     producer effect)
  C. the real placement-anchor program (control, expect ~52 cumulative)
  D. isolated v1 on a pre-multiplied volt_spec produced in XLA from the
     same chain operands (the 'materialize volt, then v1 kernel' hybrid)

    python -u tools/profile_kernel_context.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import _enable_compilation_cache

_enable_compilation_cache()

import dataclasses

import jax
import jax.numpy as jnp

# import the WHOLE library surface BEFORE any jax op touches the backend:
# module-level jnp.asarray constants (e.g. ops/attenuation._GL3_DEPTH)
# device_put eagerly, which the axon tunnel rejects mid-session (CLAUDE.md
# axon lore; cost one crashed matrix run)
from __graft_entry__ import _make_settings_and_inputs
from nuradiomc_tpu.ops import placement_pallas
from nuradiomc_tpu.sim.pipeline import simulate_batch

G, S, NR, F_INT, F_BASE = 65536, 2, 2, 257, 1025
S2 = S * NR
R = G * S2
N_SPARSE, N_TPL = 16, 3
DF = 2.0 / 2048.0
K_HI, K_LO, N_BLOCKS = 5, 1, 3


def timed(name, make):
    try:
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
    except Exception as e:
        print(json.dumps({"variant": name, "error": repr(e)[:200]}),
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

    def flat_inputs(i):
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

    def pipeline_shaped_inputs(i):
        # the pipeline's producer pattern: complex [G,S,1,NR,F] physics
        # arrays -> real/imag extraction -> moveaxis(2,1) -> reshape(R,...)
        key = jax.random.fold_in(jax.random.key(1, impl="rbg"), i)
        re5 = jax.random.normal(key, (G, S, 1, NR, F_INT), jnp.float32)
        spec5 = jax.lax.complex(re5, re5 * 0.5)
        att5 = jax.random.uniform(key, (G, S, 1, NR, N_SPARSE), jnp.float32)
        comb5 = jax.lax.complex(
            jax.random.normal(key, (G, S, 1, NR), jnp.float32),
            jax.random.normal(key, (G, S, 1, NR), jnp.float32) * 0.25)
        valid5 = comb5.real > -1.0
        off5 = jax.random.uniform(key, (G, S, 1, NR), jnp.float32) * 500.0
        tidx5 = (jnp.abs(comb5.real * 1000).astype(jnp.int32)) % N_TPL

        def ch_major(x):
            return jnp.moveaxis(x, 2, 1).reshape(R, *x.shape[4:])

        return (ch_major(spec5.real.astype(jnp.float32)),
                ch_major(spec5.imag.astype(jnp.float32)),
                jnp.moveaxis(off5, 2, 1).astype(jnp.float32).reshape(-1),
                ch_major(att5.astype(jnp.float32)),
                ch_major(comb5.real.astype(jnp.float32)),
                ch_major(comb5.imag.astype(jnp.float32)),
                ch_major(valid5.astype(jnp.float32)),
                ch_major(tidx5.astype(jnp.int32)))

    def huge_offset_inputs(i):
        # in-context, invalid rows carry t_start = 1e30 -> the kernel's
        # phase tables evaluate sincos(~1e27 rad); if Mosaic's sin/cos
        # range reduction slow-paths on huge arguments, that alone explains
        # the in-context 41 ms vs isolated 17
        sr, si, off, att, cr, ci, mask, tidx = flat_inputs(i)
        off = jnp.where(mask > 0.5, off, 1e30)
        return sr, si, off, att, cr, ci, mask, tidx

    def make_v2(inputs):
        def mk(k):
            def block(seed):
                def body(i, acc):
                    sr, si, off, att, cr, ci, mask, tidx = inputs(i + seed)
                    o_re, o_im = placement_pallas.chain_placement_reduce(
                        sr, si, att, cr, ci, mask, tidx, off, w, tpl, dr, di,
                        s2=S2, df=DF, n_templates=N_TPL, row_tile=256)
                    return acc + o_re[0, 0] + o_im[-1, -1]
                return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
            return block
        return mk

    def make_d(k):
        # hybrid: volt = tpl[tidx] * comb * spec * (att @ W) materialized by
        # XLA (one fused elementwise chain + small matmuls), then v1 kernel.
        # w/tpl stay NUMPY closures converted inside the traced body (eager
        # jnp.asarray device_puts are UNIMPLEMENTED through the tunnel).
        def block(seed):
            def body(i, acc):
                wj = jnp.asarray(w)
                tplj = jnp.asarray(tpl)
                sr, si, off, att, cr, ci, mask, tidx = flat_inputs(i + seed)
                a = att @ wj                                  # [R, F_INT]
                t = tplj[tidx]                                # gather [R,F]
                spec = jax.lax.complex(sr, si)
                comb = jax.lax.complex(cr, ci)
                volt = t * comb[:, None] * spec * a
                volt = jnp.where(mask[:, None] > 0.5, volt, 0.0)
                o_re, o_im = placement_pallas.placement_reduce(
                    volt.real, volt.imag, off, dr, di, s2=S2, df=DF,
                    row_tile=256)
                return acc + o_re[0, 0] + o_im[-1, -1]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return block

    only = set(sys.argv[1:])
    if not only or "A" in only:
        timed("A isolated v2 rbg flat", make_v2(flat_inputs))
    if not only or "B" in only:
        timed("B isolated v2 pipeline-shaped producers",
              make_v2(pipeline_shaped_inputs))
    if not only or "D" in only:
        timed("D xla-volt + v1 kernel", make_d)
    if not only or "E" in only:
        timed("E isolated v2, huge offsets on masked rows",
              make_v2(huge_offset_inputs))

    if only and "C" not in only:
        return
    # C: the real placement-anchor program, same session
    settings, ch, batch = _make_settings_and_inputs(
        n_groups=G, n_showers=S, n_channels=1, n_internal=512, n_base=2048)
    s_pl = dataclasses.replace(settings, placement_impl="pallas",
                               trigger_impl="pallas", stop_after="placement")

    def make_c(k):
        def block(seed):
            def body(i, acc):
                bb = batch._replace(energies=batch.energies *
                                    (1.0 + 1e-7 * (i + seed).astype(
                                        batch.energies.dtype)))
                out = simulate_batch(bb, ch, s_pl)
                return acc + jnp.sum(out.triggered.astype(jnp.int32)).astype(
                    jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return block

    timed("C real placement-anchor program", make_c)


if __name__ == "__main__":
    main()
