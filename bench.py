"""Benchmark: events/sec/chip for 1e18 eV Veff production pipelines.

Prints ONE JSON line (the headline dipole-Veff number) when run with no
arguments — the driver contract. Additional configurations:

    python bench.py             # headline: dipole Veff pipeline (validated)
    python bench.py pa          # 4-channel phased array + noise + ADC
    python bench.py raytrace    # ray-trace solutions/sec

Every published configuration is tied to a conformance test:

* headline: float32, n_freq_attenuation=16, attenuation_steps=32,
  n_bisect=28 — the EXACT configuration of
  tests/test_e2e.py::test_benchmark_settings_reproduce_golden, which
  reproduces the reference-golden triggered set on the 3000-event e2e input.
* pa: the tests/test_e2e_phased_array.py physics (Alvarez2009 + focusing +
  rayleigh noise + trigger-ADC + 2x upsampling + 11-beam power integration)
  at float32 on synthetic event kinematics of the same shape.
* raytrace: find_solutions pairs/sec, the solver validated against the
  reference's committed reference_C0.pkl anchor (1000/1000 at 2e-7).

Baseline: the reference runs the same physics per event in a single-core
Python loop; measured locally at ~20 events/s/core for the noiseless dipole
configuration (3000-event 1e18 eV run completing in ~2.5 minutes,
tests/golden/generate_e2e_golden.py; the noisy phased-array variant runs at
~3 events/s/core; the analytic ray tracer solves ~115 geometry pairs/s/core,
tests/golden/measure_reference_rates.py). ``vs_baseline`` = ours / reference.

Measurement lore (CLAUDE.md): ONE host dispatch/readback through the device
tunnel costs 70-110 ms and the shared chip drifts ~2x with thermal/neighbor
load — run k steps inside one jitted fori_loop per readback, repeat blocks,
take the best.
"""

import json
import sys
import time

import numpy as np

REFERENCE_EVENTS_PER_SEC_PER_CORE = 20.0       # dipole, noiseless (docstring)
REFERENCE_PA_EVENTS_PER_SEC_PER_CORE = 3.0     # phased array + noise
REFERENCE_RAYTRACE_PAIRS_PER_SEC_PER_CORE = 114.7


def _best_block_rate(step_fn, arg, n_items, k_steps, n_blocks=3):
    """Best-of-n timing of one jitted block; int() forces host readback."""
    int(step_fn(arg))          # compile + warmup
    rates = []
    for _ in range(n_blocks):
        t0 = time.perf_counter()
        int(step_fn(arg))
        rates.append(n_items * k_steps / (time.perf_counter() - t0))
    return float(np.max(rates))


def bench_veff():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_settings_and_inputs
    from nuradiomc_tpu.sim.pipeline import simulate_batch

    n_groups = 65536
    settings, ch, batch = _make_settings_and_inputs(
        n_groups=n_groups, n_showers=2, n_channels=1,
        n_internal=512, n_base=2048)

    k_steps = 5

    def block(b):
        def body(i, acc):
            bb = b._replace(energies=b.energies
                            * (1.0 + 1e-7 * i.astype(b.energies.dtype)))
            out = simulate_batch(bb, ch, settings)
            return acc + jnp.sum(out.triggered.astype(jnp.int32))
        return jax.lax.fori_loop(0, k_steps, body, jnp.int32(0))

    rate = _best_block_rate(jax.jit(block), batch, n_groups, k_steps)
    return {
        "metric": "veff_pipeline_events_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "events/s/chip",
        "vs_baseline": round(rate / REFERENCE_EVENTS_PER_SEC_PER_CORE, 1),
    }


def bench_pa():
    """Phased-array + noise + trigger-ADC configuration (the physics of
    tests/test_e2e_phased_array.py) on synthetic kinematics."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_settings_and_inputs
    from nuradiomc_tpu.ops import filters, phased_array
    from nuradiomc_tpu.sim.pipeline import simulate_batch
    from nuradiomc_tpu.utils import units

    n_groups = 16384
    settings, ch, batch = _make_settings_and_inputs(
        n_groups=n_groups, n_showers=2, n_channels=4,
        n_internal=512, n_base=2048)

    # PA trigger static config mirroring the PA e2e Simulation (4 channels
    # @ 0.5 GHz ADC, 8 bit, x2 upsampling, 11 beams, window 16, step 8)
    det_fs = 0.5
    fs_up = det_fs * 2
    angles = np.arcsin(np.linspace(np.sin(np.deg2rad(-59.54968597864437)),
                                   np.sin(np.deg2rad(59.54968597864437)), 11))
    z = np.array([-197.0 - i for i in range(4)])
    cable = np.full(4, 1051.0)
    rolls = phased_array.beam_rolls(z, cable, angles, 1.75, fs_up)
    vrms = 1e-5
    settings = dataclasses.replace(
        settings,
        askaryan_model="Alvarez2009",
        apply_focusing=True,
        add_noise=True,
        trigger_type="phased_array",
        pa_rolls=tuple(tuple(int(v) for v in row) for row in rolls),
        pa_window=int(16 * det_fs * 2), pa_step=int(8 * det_fs * 2),
        pa_upsampling=2, pa_threshold=30.85 * vrms ** 2,
        pa_digitize=True, pa_adc_fs=det_fs, pa_adc_nbits=8,
        pa_adc_range=vrms * (2 ** 8 - 1) / 15,
    )
    ff = np.fft.rfftfreq(settings.n_base, 1.0 / settings.sampling_rate)
    ff_int = np.fft.rfftfreq(settings.n_internal, 1.0 / settings.sampling_rate)
    chain = [((96 * units.MHz, 100 * units.GHz), "cheby1", {"order": 4, "rp": 0.1}),
             ((0, 220 * units.MHz), "cheby1", {"order": 7, "rp": 0.1})]
    filt = filters.chain_response(ff, chain)
    filt_int = filters.chain_response(ff_int, chain)
    ch = ch._replace(
        positions=np.asarray(np.c_[np.zeros(4), np.zeros(4), z], np.float32),
        cable_delays=np.asarray(cable, np.float32),
        filter_response=np.asarray(np.broadcast_to(filt, (4, len(ff))),
                                   np.complex64),
        filter_response_int=np.asarray(
            np.broadcast_to(filt_int, (4, len(ff_int))), np.complex64),
        noise_amplitude=np.full(4, vrms / np.sqrt(0.110 / 1.0), np.float32),
    )

    k_steps = 5

    def block(b):
        def body(i, acc):
            bb = b._replace(energies=b.energies
                            * (1.0 + 1e-7 * i.astype(b.energies.dtype)))
            out = simulate_batch(bb, ch, settings,
                                 noise_key=jax.random.fold_in(
                                     jax.random.PRNGKey(0), i))
            return acc + jnp.sum(out.triggered.astype(jnp.int32))
        return jax.lax.fori_loop(0, k_steps, body, jnp.int32(0))

    rate = _best_block_rate(jax.jit(block), batch, n_groups, k_steps)
    return {
        "metric": "pa_noise_adc_pipeline_events_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "events/s/chip",
        "vs_baseline": round(rate / REFERENCE_PA_EVENTS_PER_SEC_PER_CORE, 1),
    }


def bench_raytrace():
    """find_solutions (source, receiver) pairs per second, float32."""
    import jax
    import jax.numpy as jnp

    from nuradiomc_tpu.models import ice as ice_models
    from nuradiomc_tpu.ops import raytrace

    ice = ice_models.southpole_simple
    n_pairs = 262144
    rng = np.random.default_rng(3)
    rr = rng.triangular(50.0, 3000.0, 3000.0, n_pairs)
    x1y = np.zeros(n_pairs, np.float32)
    x1z = rng.uniform(-3000.0, 0.0, n_pairs).astype(np.float32)
    x2y = rr.astype(np.float32)
    x2z = np.full(n_pairs, -5.0, np.float32)

    k_steps = 5

    def block(args):
        a, b, c, d = args

        def body(i, acc):
            sols = jax.vmap(lambda w, x, y, z: raytrace.find_solutions(
                w, x, y, z, ice, n_bisect=28))(
                    a, b + 1e-6 * i.astype(jnp.float32), c, d)
            return acc + jnp.sum(sols.mask.astype(jnp.int32))
        return jax.lax.fori_loop(0, k_steps, body, jnp.int32(0))

    rate = _best_block_rate(jax.jit(block), (x1y, x1z, x2y, x2z),
                            n_pairs, k_steps)
    return {
        "metric": "raytrace_pairs_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "pairs/s/chip",
        "vs_baseline": round(
            rate / REFERENCE_RAYTRACE_PAIRS_PER_SEC_PER_CORE, 1),
    }


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "veff"
    result = {"veff": bench_veff, "pa": bench_pa,
              "raytrace": bench_raytrace}[mode]()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
