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


def block_time(settings, batch, ch):
    def make(k):
        def block(b):
            def body(i, acc):
                bb = b._replace(energies=b.energies *
                                (1.0 + 1e-7 * i.astype(b.energies.dtype)))
                out = simulate_batch(bb, ch, settings)
                return acc + jnp.sum(out.triggered.astype(jnp.int32))
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))
        return block

    times = {}
    for k in (K_LO, K_HI):
        fn = jax.jit(make(k))
        int(fn(batch))
        best = np.inf
        for _ in range(N_BLOCKS):
            t0 = time.perf_counter()
            int(fn(batch))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[K_HI] - times[K_LO]) / (K_HI - K_LO)


def main():
    settings, ch, batch = _make_settings_and_inputs(
        n_groups=65536, n_showers=2, n_channels=1,
        n_internal=512, n_base=2048)

    for rep in range(2):
        for impl in ("xla", "pallas", "pallas_v1"):
            s = dataclasses.replace(settings, placement_impl=impl,
                                    trigger_impl="pallas")
            t = block_time(s, batch, ch)
            print(json.dumps({"placement_impl": impl, "rep": rep,
                              "ms_per_step": round(t * 1e3, 2),
                              "events_per_s": round(65536 / t, 0)}),
                  flush=True)


if __name__ == "__main__":
    main()
