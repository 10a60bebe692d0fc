"""Cumulative stop-after ladder: attribute the REAL full step exactly.

Round-4 lesson (docs/performance.md): isolated stage timings do not
compose — XLA/Mosaic overlap DMA with compute and DCE output-only work,
so the only attribution that adds up is a ladder of truncated versions of
the REAL bench program (PipelineSettings.stop_after), each keeping
everything up to its anchor live and everything later dead. Successive
differences = the marginal cost of each stage IN CONTEXT.

Anchors: ray -> spec -> attquad -> scalars -> placement -> filter -> full.

    python -u tools/profile_ladder.py            # headline shape
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
ANCHORS = ["ray", "spec", "attquad", "scalars", "placement", "filter", ""]


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
    settings = dataclasses.replace(settings, placement_impl="pallas",
                                   trigger_impl="pallas")

    prev = 0.0
    for anchor in ANCHORS:
        s = dataclasses.replace(settings, stop_after=anchor)
        t = block_time(s, batch, ch) * 1e3
        print(json.dumps({"through": anchor or "full",
                          "cumulative_ms": round(t, 2),
                          "marginal_ms": round(t - prev, 2)}), flush=True)
        prev = t


if __name__ == "__main__":
    main()
