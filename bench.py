"""Benchmark: events/sec/chip for a 1e18 eV Veff production pipeline.

Runs the full fused MC chain (ray tracing -> Askaryan -> propagation ->
antenna -> filters -> trigger) on the real device with float32, measures
steady-state throughput, and prints ONE JSON line.

Baseline: the reference NuRadioMC runs the same physics per event in a
single-core Python loop; measured locally at ~20 events/s/core for the
noiseless dipole configuration (3000-event 1e18 eV run completing in ~2.5
minutes, tests/golden/generate_e2e_golden.py; the noisy phased-array variant
runs at ~3 events/s/core). ``vs_baseline`` = our events/s/chip divided by
the 20 events/s/core dipole rate.
"""

import json
import time

import numpy as np

REFERENCE_EVENTS_PER_SEC_PER_CORE = 20.0  # measured: see module docstring


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_settings_and_inputs
    from nuradiomc_tpu.sim.pipeline import simulate_batch

    n_groups = 65536
    settings, ch, batch = _make_settings_and_inputs(
        n_groups=n_groups, n_showers=2, n_channels=1,
        n_internal=512, n_base=2048)

    # Each host->device dispatch through the device tunnel costs ~70-110 ms
    # (measured with a no-op jit), which would dominate a per-call loop. Run
    # the production pattern instead: k pipeline steps inside ONE jitted
    # fori_loop (fresh batch each step via an i-dependent energy jitter so
    # XLA cannot hoist the body), one trigger-count readback per block.
    # Repeat blocks and take the best (the shared chip drifts ~2x with
    # thermal / neighbor load; the min reflects the pipeline itself).
    k_steps = 5

    def block(b):
        def body(i, acc):
            bb = b._replace(energies=b.energies
                            * (1.0 + 1e-7 * i.astype(b.energies.dtype)))
            out = simulate_batch(bb, ch, settings)
            return acc + jnp.sum(out.triggered.astype(jnp.int32))
        return jax.lax.fori_loop(0, k_steps, body, jnp.int32(0))

    step = jax.jit(block)
    # compile + warmup; int() forces a host readback so timing can't be
    # fooled by async dispatch through the device tunnel
    int(step(batch))

    n_blocks = 3
    rates = []
    for _ in range(n_blocks):
        t0 = time.perf_counter()
        int(step(batch))
        rates.append(n_groups * k_steps / (time.perf_counter() - t0))

    events_per_sec = float(np.max(rates))
    result = {
        "metric": "veff_pipeline_events_per_sec_per_chip",
        "value": round(events_per_sec, 1),
        "unit": "events/s/chip",
        "vs_baseline": round(events_per_sec / REFERENCE_EVENTS_PER_SEC_PER_CORE, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
