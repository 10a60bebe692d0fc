"""Same-session A/B of the trigger-stage implementations on the chip.

Times the FULL headline step (fori(k=5) vs fori(k=1) differenced, best of
3 blocks) for trigger_impl="xla" vs "pallas" on identical inputs in one
tunnel session, so the 2x thermal/neighbor drift cannot masquerade as a
kernel win or loss.

    python -u tools/profile_trigger_ab.py
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
    settings = dataclasses.replace(settings, placement_impl="pallas")

    # interleave the variants A,B,A,B so drift averages out of the compare
    for rep in range(2):
        for impl in ("xla", "pallas"):
            s = dataclasses.replace(settings, trigger_impl=impl)
            t = block_time(s, batch, ch)
            print(json.dumps({"trigger_impl": impl, "rep": rep,
                              "ms_per_step": round(t * 1e3, 2),
                              "events_per_s": round(65536 / t, 0)}),
                  flush=True)


if __name__ == "__main__":
    main()
