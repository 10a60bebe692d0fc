"""Decompose the phased-array bench step's chip cost by config ablation.

The PA workload (bench.py pa: G=16384, S=2, C=4, noise, ADC chain,
11-beam power trigger) ran at 59k ev/s in round 3 — 4.7x the per-event
cost of the headline at the same placement row count. This script varies
one knob at a time (fori(k=5)-vs-k=1 differenced, best of 3 blocks, one
tunnel session) to attribute the difference:

    python -u tools/profile_pa.py
"""
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import _enable_compilation_cache, _pa_setup

_enable_compilation_cache()

import jax
import jax.numpy as jnp

from nuradiomc_tpu.sim.pipeline import simulate_batch

K_HI, K_LO, N_BLOCKS = 5, 1, 3
N_GROUPS = 16384


def block_time(settings, batch, ch, base_key):
    def make(k):
        def block(b):
            def body(i, acc):
                bb = b._replace(energies=b.energies *
                                (1.0 + 1e-7 * i.astype(b.energies.dtype)))
                key = (None if base_key is None
                       else jax.random.fold_in(base_key, i))
                out = simulate_batch(bb, ch, settings, noise_key=key)
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
    settings, ch, batch, base_key = _pa_setup(N_GROUPS)

    variants = [
        ("baseline (xla placement, noise, ADC, up=2, 11 beams)", {}, True),
        ("placement=pallas", {"placement_impl": "pallas"}, True),
        ("no noise", {}, False),
        ("no digitize (skip 5GHz resample+decimate+quantize)",
         {"pa_digitize": False}, True),
        ("upsampling=1 (skip x2 FFT upsample)", {"pa_upsampling": 1}, True),
        ("trigger=high_low xla (no PA chain at all)",
         {"trigger_type": "high_low"}, True),
        ("trigger=high_low pallas (fused irfft+trigger)",
         {"trigger_type": "high_low", "trigger_impl": "pallas"}, True),
        ("placement=pallas + no noise", {"placement_impl": "pallas"}, False),
        ("pa-trigger=pallas (fused ADC+beam+power kernel)",
         {"trigger_impl": "pallas"}, True),
        ("all pallas (placement + pa-trigger kernels)",
         {"placement_impl": "pallas", "trigger_impl": "pallas"}, True),
        ("all pallas + gaussian noise",
         {"placement_impl": "pallas", "trigger_impl": "pallas",
          "noise_sampler": "gaussian"}, True),
    ]
    for name, kw, noisy in variants:
        s = dataclasses.replace(settings, **kw)
        t = block_time(s, batch, ch, base_key if noisy else None)
        print(json.dumps({"variant": name, "ms_per_step": round(t * 1e3, 2),
                          "events_per_s": round(N_GROUPS / t, 0)}),
              flush=True)


if __name__ == "__main__":
    main()
