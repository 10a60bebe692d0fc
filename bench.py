"""Benchmark: events/sec/chip for 1e18 eV Veff production pipelines.

Prints ONE JSON line (the headline dipole-Veff number) when run with no
arguments — the driver contract. Additional configurations:

    python bench.py             # headline: dipole Veff (pallas placement)
    python bench.py xla         # headline with the XLA placement path
    python bench.py pallas      # same as headline, labelled metric
    python bench.py pa          # 4-channel phased array + noise + ADC
    python bench.py pa_pallas   # same through the fused Pallas PA kernel
    python bench.py raytrace    # ray-trace solutions/sec
    python bench.py gen2        # 3 stations x tau secondaries x birefringence
    python bench.py v3          # headline through the v3 placement kernel

Every published configuration is tied to a conformance test:

* headline: float32, n_freq_attenuation=16, attenuation_steps=8 (GL),
  n_bisect=28, placement_impl='pallas' — the EXACT configuration of
  tests/test_e2e.py::test_benchmark_settings_reproduce_golden (which runs
  BOTH placement paths), reproducing the reference-golden triggered set on
  the 3000-event e2e input.
* pa: the tests/test_e2e_phased_array.py configuration AND event
  kinematics (Alvarez2009 + focusing + rayleigh noise + trigger-ADC + 2x
  upsampling + 11-beam power integration at float32 on the committed
  3000-event input, tiled to fill the chip).
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
take the best. k=25 amortizes the fixed dispatch cost to <1% of a block
(k=5 left ~15% of the wall time in host overhead at the round-3 step time;
the k-differenced device step itself is measured by tools/profile_stages.py).
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_EVENTS_PER_SEC_PER_CORE = 20.0       # dipole, noiseless (docstring)
REFERENCE_PA_EVENTS_PER_SEC_PER_CORE = 3.0     # phased array + noise
REFERENCE_RAYTRACE_PAIRS_PER_SEC_PER_CORE = 114.7

# Expected triggered / solution counts for ONE unperturbed step of each
# configuration, pinned from the trusted CPU path (the code the golden e2e
# tests validate against the reference) by tools/pin_bench_conformance.py.
# Every bench run re-computes the count ON THE DEVICE and asserts it, so a
# numerical divergence can never hide behind a throughput number (VERDICT
# r3 weak #2).  Two layers:
#
# * cross-BACKEND (chip vs CPU pin): a small tolerance — TPU f32 rounding
#   (fma contraction, transcendental implementations, MXU accumulation
#   order) legitimately flips borderline threshold crossings; measured
#   2026-08-19: chip computes 9759 vs CPU 9766 (0.07%% of triggered, 0.01%%
#   of groups — consistent with the round-3 margin audit's borderline
#   density). The PA mode uses a wide band instead: hardware rbg noise
#   bits differ entirely from the CPU's.
# * cross-IMPL on the SAME device (pallas vs xla, bench_veff headline):
#   EXACT equality — both paths consume identical inputs on identical
#   hardware, so any mismatch is a real Mosaic kernel bug.
EXPECTED_COUNTS = {
    # mode: (expected_count, absolute_tolerance); pinned 2026-08-19 on the
    # CPU backend (tools/pin_bench_conformance.py). Fallback layer only —
    # modes listed in VECTOR_PINS assert per-group vectors instead (below).
    "veff_pallas_f32": (9766, 32),
    "veff_xla_f32": (9766, 32),
    "veff_pallas_bf16": (9767, 32),
    "raytrace": (257079, 128),
    "pa": (178, None),         # band: +-40% (noise-statistics dependent)
    "pa_pallas": (178, None),  # same workload through the fused kernel
    "pa_noiseless": (166, 8),
    "pa_noiseless_pallas": (166, 8),
    # gen2 composed workload (3 stations x tau secondaries x birefringence,
    # 256 groups; pinned 2026-08-20)
    "gen2": (None, None),
}

# Per-group vector pins (tests/golden/bench_pins.npz, written on the CPU
# backend by tools/pin_bench_conformance.py vectors). Chip-vs-CPU f32
# rounding (fma contraction, transcendental implementations, MXU
# accumulation order) legitimately flips knife-edge decisions — but ONLY
# knife-edge decisions, in BOTH directions, so a count tolerance can hide a
# real physics bug behind offsetting flips. These assert the number of
# per-group decision FLIPS against the measured borderline density
# (2026-08-20 chip session, tools/attribute_probe_deltas.py /
# tools/attribute_bench_flips.py):
#
#   veff:  39/65536 group flips measured (chip 9759 vs CPU 9766), fully
#          attributed: 36 trigger-level knife edges (|cpu margin| from
#          5e-4 to 1.0, median 0.014 — inside the borderline population;
#          margin = (M-T)/T per tools/margin_audit.py) + 3 SOLVER-level
#          flips where the f32 bisection loses both shadow-boundary ray
#          solutions on-chip (nsols 2 -> 0, so the group's margin swings
#          from +6..+37 to -1; the same effect the raytrace pin bounds at
#          the pair level). Bidirectional (23 down / 16 up)
#                                        -> bound 56 (a physics bug
#          touching >=1% of the 9766 triggered groups shifts ~98 and
#          cannot pass; the cross-impl pallas==xla EXACT on-device check
#          below remains the zero-tolerance Mosaic-bug detector)
#   pa_nl: 3 SOURCE events measured (the 16384-group batch tiles ~5.5
#          copies of 3000 source events — flips count per source, the
#          tiling granularity)           -> bound 6 (a >=5% PA physics
#          bug shifts >=8 sources, so it cannot pass)
#   rt:    68/262144 pairs differing by +-1..2 solutions (shadow-boundary
#          bisection flips)              -> bound 256 pairs AND |delta|<=2
#   gen2:  per-(group)-station-count vector, bound 8 of 256 groups.
#          History: the FIRST on-chip run (2026-08-20) measured 23 flips
#          against the then-current pin and was a real bug, not chip
#          rounding — the f32-catastrophic birefringence eigenvector
#          formula amplified e^30..e^70 on BOTH backends, differently
#          per backend (tools/attribute_gen2_flips.py: flip margins up
#          to |1.8|, NaNs). After the reconditioned eigenbasis
#          (ops/birefringence.py _eigensystem_2x2) the pin moved
#          146 -> 63 of 256 (half the old "triggers" were garbage) and
#          the chip matches the CPU pin with ZERO flips; bound 8 kept as
#          headroom for the measured 0.16-p99 cross-backend margin
#          perturbation of the f32 scan.
VECTOR_PINS = {
    "veff_pallas_f32": ("veff_trig", "groups", 56),
    "veff_xla_f32": ("veff_trig", "groups", 56),
    "pa_noiseless": ("pa_nl_trig", "sources", 6),
    "pa_noiseless_pallas": ("pa_nl_trig", "sources", 6),
    "raytrace": ("rt_nsol", "pairs", 256),
    "gen2": ("gen2_trig", "groups", 8),
}

_PINS_CACHE = []


def _load_pins():
    if not _PINS_CACHE:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tests", "golden", "bench_pins.npz")
        _PINS_CACHE.append(np.load(path) if os.path.exists(path) else None)
    return _PINS_CACHE[0]


def _conformance_check(mode, probe_fn, arg):
    """Run the single-step probe on the device and assert its decisions.

    ``probe_fn`` returns the per-group decision/count vector (or a scalar
    count for band-only modes). Modes in VECTOR_PINS assert the number of
    per-group flips vs the CPU-pinned vector; others assert the count.
    Returns (count, expected) for the JSON line. Raises AssertionError
    AFTER printing a machine-readable failure record so the driver log
    always shows what the chip computed.
    """
    vec = np.atleast_1d(np.asarray(probe_fn(arg)))
    count = int(vec.sum())
    skip = bool(os.environ.get("BENCH_SKIP_CONFORMANCE"))

    pins = _load_pins()
    pin_spec = VECTOR_PINS.get(mode)
    if (pin_spec is not None and pins is not None
            and pin_spec[0] in pins and len(vec) > 1 and not skip
            and len(pins[pin_spec[0]]) == len(vec)):
        # (length mismatch = stale pin after a workload-shape change:
        # fall through to the count layer rather than crash)
        key, kind, bound = pin_spec
        ref = pins[key].astype(np.int64)
        d = vec.astype(np.int64) - ref
        idx = np.where(d != 0)[0]
        if kind == "sources":
            g0 = int(pins["pa_g0"])
            n_flips = len(set(int(i) % g0 for i in idx))
        else:
            n_flips = len(idx)
        ok = n_flips <= bound and (kind != "pairs"
                                   or not len(idx)
                                   or int(np.abs(d).max()) <= 2)
        if not ok:
            print(json.dumps({"metric": f"conformance_{mode}",
                              "value": count, "unit": "triggered",
                              "expected": int(ref.sum()),
                              "n_flips": n_flips, "flip_bound": bound,
                              "conformance": "FAIL"}))
            raise AssertionError(
                f"chip-side conformance FAILED for {mode}: {n_flips} "
                f"per-group decision flips vs the CPU pin (bound {bound}; "
                f"device count {count}, pinned {int(ref.sum())})")
        return count, int(ref.sum())

    expected, tol = EXPECTED_COUNTS.get(mode, (None, None))
    if expected is None or skip:
        return count, expected
    if tol is None:   # statistical band (noisy configuration)
        lo, hi = 0.6 * expected, 1.4 * expected
        ok = lo <= count <= hi
    else:
        ok = abs(count - expected) <= tol
    if not ok:
        print(json.dumps({"metric": f"conformance_{mode}", "value": count,
                          "unit": "triggered", "expected": expected,
                          "conformance": "FAIL"}))
        raise AssertionError(
            f"chip-side conformance FAILED for {mode}: device computed "
            f"{count} triggered, CPU-pinned expectation {expected} "
            f"(tol {tol})")
    return count, expected


def _best_block_rate(step_fn, arg, n_items, k_steps, n_blocks=3):
    """Best-of-n timing of one jitted block; int() forces host readback."""
    int(step_fn(arg))          # compile + warmup
    rates = []
    for _ in range(n_blocks):
        t0 = time.perf_counter()
        int(step_fn(arg))
        rates.append(n_items * k_steps / (time.perf_counter() - t0))
    return float(np.max(rates))


def _veff_settings_and_inputs(placement_impl, matmul_dtype,
                              trigger_impl=None, n_groups=65536):
    """The EXACT headline configuration — shared with
    tools/pin_bench_conformance.py so the CPU-pinned counts always match
    what the chip runs."""
    import dataclasses

    from __graft_entry__ import _make_settings_and_inputs

    settings, ch, batch = _make_settings_and_inputs(
        n_groups=n_groups, n_showers=2, n_channels=1,
        n_internal=512, n_base=2048)
    if trigger_impl is None:
        # the fused trigger kernel is part of the pallas bench path
        trigger_impl = "pallas" if placement_impl == "pallas" else "xla"
    # band-limited compute at eps=1e-2 (K_int 208/257, K_base 816/1025):
    # licensed by the 3000-event golden holding the identical triggered
    # set + borderline budget (test_e2e.py::test_benchmark_settings_...)
    settings = dataclasses.replace(settings, placement_impl=placement_impl,
                                   matmul_dtype=matmul_dtype,
                                   trigger_impl=trigger_impl,
                                   band_limit_eps=1e-2)
    return settings, ch, batch


def bench_veff(placement_impl="pallas", labelled=False,
               matmul_dtype="float32", trigger_impl=None):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nuradiomc_tpu.sim.pipeline import simulate_batch

    n_groups = 65536
    settings, ch, batch = _veff_settings_and_inputs(
        placement_impl, matmul_dtype, trigger_impl, n_groups)

    k_steps = 25

    def block(b):
        def body(i, acc):
            bb = b._replace(energies=b.energies
                            * (1.0 + 1e-7 * i.astype(b.energies.dtype)))
            out = simulate_batch(bb, ch, settings)
            return acc + jnp.sum(out.triggered.astype(jnp.int32))
        return jax.lax.fori_loop(0, k_steps, body, jnp.int32(0))

    @jax.jit
    def probe(b):
        out = simulate_batch(b, ch, settings)
        return out.triggered.astype(jnp.int32)

    mode = (f"veff_{placement_impl}_"
            + ("bf16" if matmul_dtype == "bfloat16" else "f32"))
    vec = np.asarray(probe(batch))
    count, expected = _conformance_check(mode, lambda _: vec, None)

    if placement_impl == "pallas":
        # cross-impl conformance ON the device: the xla placement path on
        # the same inputs/hardware must agree PER GROUP EXACTLY with the
        # Mosaic kernel (catches kernel bugs that backend rounding cannot
        # excuse)
        settings_xla = dataclasses.replace(settings, placement_impl="xla",
                                           trigger_impl="xla")

        @jax.jit
        def probe_xla(b):
            out = simulate_batch(b, ch, settings_xla)
            return out.triggered.astype(jnp.int32)

        vec_xla = np.asarray(probe_xla(batch))
        if (vec_xla != vec).any() and not os.environ.get(
                "BENCH_SKIP_CONFORMANCE"):
            count_xla = int(vec_xla.sum())
            print(json.dumps({"metric": f"conformance_{mode}_cross_impl",
                              "value": count, "xla": count_xla,
                              "n_flips": int((vec_xla != vec).sum()),
                              "conformance": "FAIL"}))
            raise AssertionError(
                f"pallas vs xla decisions differ ON the same device for "
                f"{int((vec_xla != vec).sum())} groups ({count} vs "
                f"{count_xla} total) — Mosaic kernel divergence")
    rate = _best_block_rate(jax.jit(block), batch, n_groups, k_steps)
    suffix = f"_{placement_impl}" if labelled else ""
    return {
        "metric": f"veff_pipeline_events_per_sec_per_chip{suffix}",
        "value": round(rate, 1),
        "unit": "events/s/chip",
        "vs_baseline": round(rate / REFERENCE_EVENTS_PER_SEC_PER_CORE, 1),
        "triggered_count": count, "conformance": "ok" if expected else "unpinned",
    }


def _pa_setup(n_groups=16384):
    """Build the phased-array bench workload: the EXACT configuration and
    event kinematics of tests/test_e2e_phased_array.py (the validated
    workload), batch tiled up to fill the chip."""
    import os

    import jax
    import jax.numpy as jnp

    from nuradiomc_tpu.sim.simulation import (FilterStage, Simulation,
                                              TriggerSpec)
    from nuradiomc_tpu.utils import units

    here = os.path.dirname(os.path.abspath(__file__))
    sim = Simulation(
        os.path.join(here, "tests", "data", "1e18_n3000.hdf5"),
        {"channels": {str(i + 1): {
            "adc_n_samples": 256, "adc_sampling_frequency": 0.5,
            "adc_nbits": 8,
            "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
            "ant_position_x": 0.0, "ant_position_y": 0.0,
            "ant_position_z": -197.0 - i,
            "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
            "ant_type": "RNOG_vpol_v1_n1.73", "amp_type": "",
            "cab_time_delay": 1051.0, "channel_id": i, "station_id": 1,
        } for i in range(4)},
         "stations": {"1": {"station_id": 1, "pos_altitude": 0,
                            "pos_easting": 0, "pos_northing": 0}}},
        config={"sampling_rate": 2.0, "noise": True,
                "propagation": {"ice_model": "southpole_2015",
                                "focusing": True, "n_freq": 16,
                                "attenuation_steps": 8, "n_bisect": 28},
                "signal": {"model": "Alvarez2009"},
                "weights": {"weight_mode": "core_mantle_crust_simple",
                            "cross_section_type": "ctw"}},
        filter_chain=[
            FilterStage((96 * units.MHz, 100 * units.GHz), "cheby1",
                        {"order": 4, "rp": 0.1}),
            FilterStage((0, 220 * units.MHz), "cheby1",
                        {"order": 7, "rp": 0.1}),
        ],
        trigger=TriggerSpec(trigger_type="phased_array"),
        antenna_replacements={"RNOG_vpol_v1_n1.73": "analytic_VPol"},
        dtype=jnp.float32)
    _, _, _, _, batch0 = sim._build_batches()
    g0 = batch0.energies.shape[0]
    reps = -(-n_groups // g0)

    def tile(a):
        if a is None:
            return None
        a = np.asarray(a)
        return np.tile(a, (reps,) + (1,) * (a.ndim - 1))[:n_groups]

    batch = jax.tree.map(tile, batch0)
    # rbg PRNG: hardware-accelerated random bits on TPU (threefry key
    # splitting + bit generation is a measurable slice of the noisy step)
    base_key = jax.random.key(0, impl="rbg")
    return sim.settings, sim.channel_params, batch, base_key


def bench_pa(fused=False):
    """Phased-array workload; fused=True runs the Pallas placement +
    PA-trigger kernels (ops/pa_pallas.py) validated by
    tests/test_pa_pallas.py::test_fused_pa_e2e_golden_decisions."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nuradiomc_tpu.sim.pipeline import simulate_batch

    n_groups = 16384
    settings, ch, batch, base_key = _pa_setup(n_groups)
    # band-limited compute: the cheby chain (220 MHz cutoff, 1 GHz Nyquist)
    # suppresses the dropped rows below 1e-3 — K_int 256/513, K_base
    # 512/1025, i.e. half the placement-DFT and irfft/ADC matmul FLOPs.
    # Licensed by the noiseless PA golden holding the identical triggered
    # set (tests/test_e2e_phased_array.py::test_noiseless_pa_exact_...).
    settings = dataclasses.replace(settings, band_limit_eps=1e-3)
    if fused:
        settings = dataclasses.replace(settings, placement_impl="pallas",
                                       trigger_impl="pallas")
    k_steps = 25

    def block(b):
        def body(i, acc):
            bb = b._replace(energies=b.energies
                            * (1.0 + 1e-7 * i.astype(b.energies.dtype)))
            out = simulate_batch(bb, ch, settings,
                                 noise_key=jax.random.fold_in(base_key, i))
            return acc + jnp.sum(out.triggered.astype(jnp.int32))
        return jax.lax.fori_loop(0, k_steps, body, jnp.int32(0))

    @jax.jit
    def probe(b):
        out = simulate_batch(b, ch, settings,
                             noise_key=jax.random.fold_in(base_key, 0))
        return jnp.sum(out.triggered.astype(jnp.int32))

    mode = "pa_pallas" if fused else "pa"
    count, expected = _conformance_check(mode, probe, batch)

    # deterministic companion probe: the SAME PA chain without noise has an
    # exact CPU-pinned count (the noiseless PA golden's physics), so a PA
    # kernel bug can never hide inside the noisy mode's statistical band
    # (VERDICT r4 weak #5)
    settings_nl = dataclasses.replace(settings, add_noise=False)

    @jax.jit
    def probe_noiseless(b):
        out = simulate_batch(b, ch, settings_nl)
        return out.triggered.astype(jnp.int32)

    count_nl, expected_nl = _conformance_check(
        "pa_noiseless" + ("_pallas" if fused else ""), probe_noiseless,
        batch)

    if fused:
        # cross-impl ON the device with IDENTICAL noise draws: only
        # razor-thin power margins may flip between the Mosaic kernel's
        # doubling-tree power sums and the XLA cumsum (the tolerance the
        # validated pipeline test allows, scaled to the tiled batch)
        settings_xla = dataclasses.replace(settings, placement_impl="xla",
                                           trigger_impl="xla")

        @jax.jit
        def probe_xla(b):
            out = simulate_batch(b, ch, settings_xla,
                                 noise_key=jax.random.fold_in(base_key, 0))
            return jnp.sum(out.triggered.astype(jnp.int32))

        count_xla = int(probe_xla(batch))
        if abs(count_xla - count) > 8 and not os.environ.get(
                "BENCH_SKIP_CONFORMANCE"):
            print(json.dumps({"metric": "conformance_pa_cross_impl",
                              "value": count, "xla": count_xla,
                              "conformance": "FAIL"}))
            raise AssertionError(
                f"fused PA ({count}) vs xla ({count_xla}) triggered counts "
                f"differ beyond margin tolerance ON the same device")
    rate = _best_block_rate(jax.jit(block), batch, n_groups, k_steps)
    return {
        "metric": "pa_noise_adc_pipeline_events_per_sec_per_chip"
                  + ("_pallas" if fused else ""),
        "value": round(rate, 1),
        "unit": "events/s/chip",
        "vs_baseline": round(rate / REFERENCE_PA_EVENTS_PER_SEC_PER_CORE, 1),
        "note": "validated e2e input kinematics (tiled), round-3 onward",
        "triggered_count": count, "conformance": "ok" if expected else "unpinned",
        "noiseless_count": count_nl,
        "noiseless_conformance": "ok" if expected_nl else "unpinned",
    }


def _gen2_setup(n_groups=1024):
    """Gen2 composed workload (driver benchmark config #5, the
    tests/test_gen2_array.py physics): 3-station radio array x stochastic
    tau secondaries (multi-shower groups) x birefringence-enabled
    propagation, float32. The tau input is generated once (seed-pinned)
    into .bench_cache and tiled up to ``n_groups`` event groups."""
    import jax
    import jax.numpy as jnp

    from nuradiomc_tpu.sim import evtgen
    from nuradiomc_tpu.sim.simulation import (FilterStage, Simulation,
                                              TriggerSpec)
    from nuradiomc_tpu.utils import units

    here = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(here, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, "gen2_taus_2048_seed21.hdf5")
    if not os.path.exists(path):
        evtgen.generate_eventlist_cylinder(
            path, 2048, 1e19, 1e19,
            {"fiducial_rmin": 0, "fiducial_rmax": 3 * units.km,
             "fiducial_zmin": -2.7 * units.km, "fiducial_zmax": 0},
            seed=21, flavor=(16, -16), interaction_type="cc",
            secondaries="stochastic")

    def _channel(cid, sid, z):
        return {"adc_n_samples": 256, "adc_sampling_frequency": 1.0,
                "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
                "ant_position_x": 0.0, "ant_position_y": 0.0,
                "ant_position_z": z,
                "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
                "ant_type": "analytic_VPol", "amp_type": "",
                "cab_time_delay": 10.0, "adc_nbits": None,
                "channel_id": cid, "station_id": sid}

    det = {
        "channels": {
            "1": _channel(0, 101, -100.0), "2": _channel(1, 101, -150.0),
            "3": _channel(0, 102, -100.0), "4": _channel(1, 102, -150.0),
            "5": _channel(0, 103, -100.0), "6": _channel(1, 103, -150.0),
        },
        "stations": {
            "1": {"station_id": 101, "pos_easting": 0.0,
                  "pos_northing": 0.0, "pos_altitude": 0},
            "2": {"station_id": 102, "pos_easting": 1700.0,
                  "pos_northing": 0.0, "pos_altitude": 0},
            "3": {"station_id": 103, "pos_easting": 850.0,
                  "pos_northing": 1470.0, "pos_altitude": 0},
        },
    }
    sim = Simulation(
        path, det,
        config={"sampling_rate": 2.0,
                "propagation": {"ice_model": "southpole_2015",
                                "birefringence": True,
                                "birefringence_model": "southpole_A",
                                "n_freq": 16, "attenuation_steps": 8,
                                "n_bisect": 28},
                "signal": {"model": "Alvarez2000"},
                "weights": {"weight_mode": "core_mantle_crust_simple",
                            "cross_section_type": "ctw"}},
        filter_chain=[
            FilterStage((80 * units.MHz, 1000 * units.GHz), "butter",
                        {"order": 2}),
            FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
        ],
        trigger=TriggerSpec(threshold_high_sigma=2.0,
                            threshold_low_sigma=-2.0),
        dtype=jnp.float32)
    _, _, _, _, batch0 = sim._build_batches()
    g0 = batch0.energies.shape[0]
    reps = -(-n_groups // g0)

    def tile(a):
        if a is None:
            return None
        a = np.asarray(a)
        return np.tile(a, (reps,) + (1,) * (a.ndim - 1))[:n_groups]

    batch = jax.tree.map(tile, batch0)
    chps = [sim.channel_params_per_station[sid]
            for sid in sim.det.get_station_ids()]
    return sim.settings, chps, batch


def bench_gen2():
    """Gen2 composed workload: 3 stations x multi-shower tau groups x
    birefringence, events/s = event groups per second with ALL stations
    evaluated (the per-event cost is ~3x a single-station step)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nuradiomc_tpu.sim.pipeline import simulate_batch

    # G=256: the birefringence-enabled legacy chain materializes [G, S=10,
    # C, R, F] complex intermediates; G=1024 exhausted device HBM under
    # remat and G=512 still needed 21.2G of the 15.75G HBM (measured
    # 2026-08-20 on-chip) — 256 fits and still amortizes dispatch over
    # k_steps
    n_groups = 256
    settings, chps, batch = _gen2_setup(n_groups)
    # birefringence rides the legacy (non-factored) chain: the fused v2
    # chain kernel does not apply, but the v1 placement kernel and the
    # fused trigger kernel do
    settings = dataclasses.replace(settings, placement_impl="pallas",
                                   trigger_impl="pallas")
    k_steps = 10

    def block(b):
        def body(i, acc):
            bb = b._replace(energies=b.energies
                            * (1.0 + 1e-7 * i.astype(b.energies.dtype)))
            for chp in chps:
                out = simulate_batch(bb, chp, settings)
                acc = acc + jnp.sum(out.triggered.astype(jnp.int32))
            return acc
        return jax.lax.fori_loop(0, k_steps, body, jnp.int32(0))

    @jax.jit
    def probe(b):
        # per-group station-count vector (0..3): the pinned gen2 vector
        return sum(simulate_batch(b, chp, settings).triggered
                   .astype(jnp.int32) for chp in chps)

    count, expected = _conformance_check("gen2", probe, batch)
    rate = _best_block_rate(jax.jit(block), batch, n_groups, k_steps)
    return {
        "metric": "gen2_composed_events_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "events/s/chip",
        "vs_baseline": round(rate / REFERENCE_EVENTS_PER_SEC_PER_CORE, 1),
        "note": "3 stations x stochastic tau secondaries x birefringence",
        "triggered_count": count,
        "conformance": "ok" if expected else "unpinned",
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

    k_steps = 25

    def block(args):
        a, b, c, d = args

        def body(i, acc):
            sols = jax.vmap(lambda w, x, y, z: raytrace.find_solutions(
                w, x, y, z, ice, n_bisect=28))(
                    a, b + 1e-6 * i.astype(jnp.float32), c, d)
            return acc + jnp.sum(sols.mask.astype(jnp.int32))
        return jax.lax.fori_loop(0, k_steps, body, jnp.int32(0))

    @jax.jit
    def probe(args):
        a, b, c, d = args
        sols = jax.vmap(lambda w, x, y, z: raytrace.find_solutions(
            w, x, y, z, ice, n_bisect=28))(a, b, c, d)
        return jnp.sum(sols.mask.astype(jnp.int32), axis=-1)  # per pair

    count, expected = _conformance_check("raytrace", probe,
                                         (x1y, x1z, x2y, x2z))
    rate = _best_block_rate(jax.jit(block), (x1y, x1z, x2y, x2z),
                            n_pairs, k_steps)
    return {
        "metric": "raytrace_pairs_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "pairs/s/chip",
        "vs_baseline": round(
            rate / REFERENCE_RAYTRACE_PAIRS_PER_SEC_PER_CORE, 1),
        "triggered_count": count, "conformance": "ok" if expected else "unpinned",
    }


def _enable_compilation_cache():
    """Persistent executable cache for the device backend.

    The shared tunnel has multi-hour wedge windows where every FRESH
    compile hangs but CACHED programs still run (CLAUDE.md axon lore);
    with the persistent cache a bench invocation after one prior
    successful run skips compilation entirely.  Fail-safe: on a backend
    that cannot serialize executables the cache just stays empty.
    """
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def main():
    _enable_compilation_cache()
    mode = sys.argv[1] if len(sys.argv) > 1 else "veff"
    result = {"veff": bench_veff, "pa": bench_pa,
              "pa_pallas": lambda: bench_pa(fused=True),
              "raytrace": bench_raytrace, "gen2": bench_gen2,
              "v3": lambda: bench_veff("pallas_v3", labelled=True,
                                       trigger_impl="pallas"),
              "pallas": lambda: bench_veff("pallas", labelled=True),
              "xla": lambda: bench_veff("xla", labelled=True),
              "bf16": lambda: dict(bench_veff("pallas", matmul_dtype="bfloat16"),
                                   metric="veff_pipeline_events_per_sec_per_chip_bf16")}[mode]()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
