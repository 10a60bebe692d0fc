"""Same-session full-step A/B: placement_impl xla vs pallas vs pallas_v1.

The fused placement kernel runs at 19.9 TFLOP/s (13% of the demonstrated
MXU rate) because its VPU epilogue starves the MXU; XLA's unfused path
pays ~4.3 GB of HBM intermediates instead but runs the matmul at full
rate and pipelines the elementwise chain. "pallas_v1" is the hybrid:
XLA materializes volt_spec (fused elementwise at full rate), the kernel
does only DFT placement + phase + reduce — isolated it measured 20 ms vs
the chain kernel's 41 ms in-context (tools/profile_kernel_context.py).
This measures which wins on the REAL full step, interleaved in one
tunnel session.

    python -u tools/profile_placement_ab.py
"""
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import _enable_compilation_cache

_enable_compilation_cache()

import jax
import jax.numpy as jnp

from __graft_entry__ import _make_settings_and_inputs
from nuradiomc_tpu.sim.pipeline import simulate_batch

K_HI, K_LO, N_BLOCKS = 5, 1, 3


def make_block(settings, ch, k):
    def block(b):
        def body(i, acc):
            bb = b._replace(energies=b.energies *
                            (1.0 + 1e-7 * i.astype(b.energies.dtype)))
            out = simulate_batch(bb, ch, settings)
            return acc + jnp.sum(out.triggered.astype(jnp.int32))
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    return block


def main():
    impls = (sys.argv[1].split(",") if len(sys.argv) > 1
             else ("xla", "pallas", "pallas_v3"))
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    # the EXACT headline configuration (incl. band_limit_eps=1e-2)
    from bench import _veff_settings_and_inputs
    settings, ch, batch = _veff_settings_and_inputs("pallas", "float32")

    # drift-fair: precompile EVERY (impl, k) program, then round-robin one
    # timed call each per round (the shared chip drifts ~2x between
    # multi-minute windows — back-to-back interleaving is the only fair A/B).
    # Progress/results print INCREMENTALLY: 8 axon compiles can cost 10+
    # minutes through the tunnel, and a timeout must still leave data.
    fns = {}
    for impl in impls:
        # spec: impl[:phase[:dtype]] e.g. "pallas:bitprod" or
        # "pallas:table:bfloat16" (dtype = placement DFT matmul dtype)
        parts = (impl.split(":") + ["", ""])[:3]
        impl_name, phase, mdtype = parts
        s = dataclasses.replace(settings, placement_impl=impl_name,
                                placement_phase=phase or "table",
                                matmul_dtype=mdtype or "float32",
                                trigger_impl="pallas")
        for k in (K_LO, K_HI):
            t0 = time.perf_counter()
            fn = jax.jit(make_block(s, ch, k))
            int(fn(batch))                    # compile + warm
            print(json.dumps({"compiled": f"{impl}:k{k}",
                              "s": round(time.perf_counter() - t0, 1)}),
                  flush=True)
            fns[(impl, k)] = fn
    best = {key: np.inf for key in fns}
    for r in range(n_rounds):
        for key, fn in fns.items():
            t0 = time.perf_counter()
            int(fn(batch))
            best[key] = min(best[key], time.perf_counter() - t0)
        for impl in impls:
            t = (best[(impl, K_HI)] - best[(impl, K_LO)]) / (K_HI - K_LO)
            print(json.dumps({"round": r, "placement_impl": impl,
                              "ms_per_step": round(t * 1e3, 2),
                              "events_per_s": round(65536 / t, 0)}),
                  flush=True)


if __name__ == "__main__":
    main()
