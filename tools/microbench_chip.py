"""Microbenchmark THIS chip's actual peaks: dense matmul TFLOP/s (f32 and
bf16), HBM stream GB/s, VPU elementwise and transcendental rates.

VERDICT r4 weak #4: tools/profile_stages.py pinned PEAK_F32_TFLOPS = 49
("TPU v5e datasheet") while the trigger-irfft matmul measured 156 TFLOP/s
— every MFU and speed-of-light estimate stood on a self-contradicting
constant. This file measures the peaks once, with documented dims/dtypes
so the FLOP accounting is checkable, and the roofline constants elsewhere
cite it.

Method (CLAUDE.md measurement lore): k iterations chained inside ONE
jitted fori_loop per readback (each iteration consumes the previous
result, so XLA cannot hoist or DCE), k=K_HI vs k=K_LO differenced to
cancel the dispatch floor, best of N blocks.

    python -u tools/microbench_chip.py
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

# K must be large enough that the K_HI-K_LO work delta DWARFS the tunnel
# RPC noise: at K=16 vs 2 the 14-iteration delta (~40 ms of matmul) sat
# inside the 0.1-1 s dispatch jitter and produced NEGATIVE differenced
# times (measured 2026-08-20). 224 extra iterations puts ~0.5-20 s of
# device work between the two timings.
K_HI, K_LO, N_BLOCKS = 256, 32, 3


def _diff_time(make_block, arg, k_hi=None, k_lo=None):
    times = {}
    for k in (k_lo or K_LO, k_hi or K_HI):
        fn = jax.jit(make_block(k))
        int(fn(arg))                      # compile + warm
        best = np.inf
        for _ in range(N_BLOCKS):
            t0 = time.perf_counter()
            int(fn(arg))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    ks = sorted(times)
    return (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0])


def bench_matmul(n=4096, dtype=jnp.float32):
    """Chained square matmul: acc <- (acc @ b) / n. 2*n^3 FLOP/iter.

    Operands generated in-jit (iota hashes): host numpy arguments of this
    size re-upload through the tunnel on EVERY timed call. MXU throughput
    is data-independent, so synthetic values time identically."""

    def make(k):
        def block(seed):
            r = jax.lax.broadcasted_iota(jnp.float32, (n, n), 0)
            c = jax.lax.broadcasted_iota(jnp.float32, (n, n), 1)
            x = (jnp.sin(r * 0.37 + c * 0.11) + seed).astype(dtype)
            y = (jnp.sin(r * 0.13 - c * 0.29) / np.sqrt(n)).astype(dtype)

            def body(i, acc):
                return jnp.dot(acc, y,
                               preferred_element_type=dtype)
            out = jax.lax.fori_loop(0, k, body, x)
            return jnp.sum(out.astype(jnp.float32)).astype(jnp.int32)
        return block

    # bf16 iterations are ~4x faster — scale the iteration delta so the
    # measured work dwarfs the 0.1-1 s tunnel RPC jitter (a 224-iteration
    # bf16 delta is ~0.16 s and produced NEGATIVE times on 2026-08-20)
    k_hi = K_HI * 4 if jnp.dtype(dtype).itemsize < 4 else None
    k_lo = K_LO * 4 if jnp.dtype(dtype).itemsize < 4 else None
    t = _diff_time(make, np.float32(0.0), k_hi=k_hi, k_lo=k_lo)
    tflops = 2.0 * n ** 3 / t / 1e12
    return {"metric": f"matmul_{jnp.dtype(dtype).name}_tflops",
            "value": round(tflops, 1), "dims": f"{n}x{n}x{n}",
            "sec_per_iter": t}


def bench_matmul_indep(n=4096, dtype=jnp.float32):
    """Independent (non-chained) matmuls: body perturbs one operand by the
    loop index so iterations cannot be hoisted OR serialized through the
    MXU — measures throughput with latency hiding, vs bench_matmul's
    serial acc@b chain which measures the dependent-chain rate."""
    def make(k):
        def block(seed):
            r = jax.lax.broadcasted_iota(jnp.float32, (n, n), 0)
            c = jax.lax.broadcasted_iota(jnp.float32, (n, n), 1)
            x = jnp.sin(r * 0.37 + c * 0.11) + seed
            y = (jnp.sin(r * 0.13 - c * 0.29) / np.sqrt(n)).astype(dtype)

            def body(i, acc):
                xi = (x + i.astype(jnp.float32)).astype(dtype)
                # full-sum accumulation: slicing the product would let XLA
                # shrink the matmul to a vector dot (slice propagation)
                return acc + jnp.sum(jnp.dot(
                    xi, y, preferred_element_type=jnp.float32))
            out = jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
            return out.astype(jnp.int32)
        return block

    k_hi = K_HI * 4 if jnp.dtype(dtype).itemsize < 4 else None
    k_lo = K_LO * 4 if jnp.dtype(dtype).itemsize < 4 else None
    t = _diff_time(make, np.float32(0.0), k_hi=k_hi, k_lo=k_lo)
    tflops = 2.0 * n ** 3 / t / 1e12
    return {"metric": f"matmul_indep_{jnp.dtype(dtype).name}_tflops",
            "value": round(tflops, 1), "dims": f"{n}x{n}x{n}",
            "sec_per_iter": t}


def bench_irfft_shape(rows=65536, k_base=816, n_base=2048,
                      dtype=jnp.float32):
    """The EXACT trigger-irfft matmul shape of the headline bench
    ([R, K_base] @ [K_base, n_base], band-limited eps=1e-2), measured in
    isolation — settles whether round-4's '156 TFLOP/s f32' was real or
    a FLOP-accounting error (2 matmuls re+im, DCE, windows)."""
    def make(k):
        def block(seed):
            r = jax.lax.broadcasted_iota(jnp.float32, (rows, k_base), 0)
            c = jax.lax.broadcasted_iota(jnp.float32, (rows, k_base), 1)
            x = jnp.sin(r * 0.0007 + c * 0.11) + seed
            r2 = jax.lax.broadcasted_iota(jnp.float32, (k_base, n_base), 0)
            c2 = jax.lax.broadcasted_iota(jnp.float32, (k_base, n_base), 1)
            y = (jnp.sin(r2 * 0.13 - c2 * 0.003)
                 / np.sqrt(k_base)).astype(dtype)

            def body(i, acc):
                xi = (x + i.astype(jnp.float32)).astype(dtype)
                # full-sum accumulation: slicing the product would let XLA
                # shrink the matmul to a vector dot (slice propagation)
                return acc + jnp.sum(jnp.dot(
                    xi, y, preferred_element_type=jnp.float32))
            out = jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
            return out.astype(jnp.int32)
        return block

    t = _diff_time(make, np.float32(0.0))
    tflops = 2.0 * rows * k_base * n_base / t / 1e12
    return {"metric": f"irfft_shape_{jnp.dtype(dtype).name}_tflops",
            "value": round(tflops, 1),
            "dims": f"{rows}x{k_base}x{n_base}", "sec_per_iter": t}


def bench_hbm(mb=512):
    """Stream: x <- x * c + d. One HBM read + one write of the array per
    iteration -> bytes/iter = 2 * size.

    The array is GENERATED in-jit from a scalar seed — a host-side numpy
    argument of this size re-uploads through the tunnel on every call
    (~minutes for 512 MB; the 2026-08-20 session timed out on it)."""
    n = mb * 2 ** 20 // 4

    def make(k):
        def block(seed):
            x = jnp.full((n,), seed, jnp.float32)

            def body(i, acc):
                return acc * jnp.float32(0.999999) + jnp.float32(1e-9)
            out = jax.lax.fori_loop(0, k, body, x)
            return out[0].astype(jnp.int32)
        return block

    t = _diff_time(make, np.float32(1.0))
    gbs = 2.0 * n * 4 / t / 1e9
    return {"metric": "hbm_stream_gbps", "value": round(gbs, 1),
            "array_mb": mb, "sec_per_iter": t}


def bench_vpu(mb=64, op="mul_add"):
    """VPU rate on a VMEM/HBM-streamed elementwise chain.

    op='mul_add': x*c+d        (2 flop/elem/iter, fused -> 1 VPU op)
    op='sincos' : sin(x)       (1 transcendental/elem/iter)

    Array generated in-jit (see bench_hbm: host arrays re-upload through
    the tunnel every call)."""
    n = mb * 2 ** 20 // 4

    def make(k):
        def block(seed):
            x = jnp.full((n,), seed, jnp.float32)

            def body(i, acc):
                if op == "sincos":
                    return jnp.sin(acc)
                return acc * jnp.float32(0.9999) + jnp.float32(1e-6)
            out = jax.lax.fori_loop(0, k, body, x)
            return out[0].astype(jnp.int32)
        return block

    t = _diff_time(make, np.float32(0.5))
    geps = n / t / 1e9
    return {"metric": f"vpu_{op}_gelem_per_s", "value": round(geps, 1),
            "array_mb": mb, "sec_per_iter": t}


BENCHES = {
    "f32": lambda: bench_matmul(4096, jnp.float32),
    "bf16": lambda: bench_matmul(4096, jnp.bfloat16),
    "f32i": lambda: bench_matmul_indep(4096, jnp.float32),
    "bf16i": lambda: bench_matmul_indep(4096, jnp.bfloat16),
    "irfft_f32": lambda: bench_irfft_shape(dtype=jnp.float32),
    "irfft_bf16": lambda: bench_irfft_shape(dtype=jnp.bfloat16),
    "hbm": bench_hbm,
    "vpu": lambda: bench_vpu(64, "mul_add"),
    "sincos": lambda: bench_vpu(64, "sincos"),
}


def main():
    names = sys.argv[1:] or list(BENCHES)
    for name in names:
        try:
            print(json.dumps(BENCHES[name]()), flush=True)
        except Exception as e:  # keep going if one shape fails to compile
            print(json.dumps({"name": name, "error": repr(e)}), flush=True)


if __name__ == "__main__":
    main()
