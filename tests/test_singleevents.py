"""The reference's SingleEvents CI chain (test/SingleEvents/validate.sh):
a two-station surface detector (4 down-pointing LPDAs + 4 dipoles, station
102 defaulted from 101) with THREE named triggers, two gated on the first
via set_not_triggered (T02RunSimulation.py:36-61), on the reference's own
committed 22-event input. Golden regenerated in-container with analytic
antennas on both sides (tests/golden/generate_singleevents.py).

This pins, in one chain: generic-detector station defaulting, the
ARAsim_southpole ice model end-to-end, multi-station OR aggregation, the
`requires` trigger-dependency gating, and per-name trigger times on an
8-channel surface station.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from nuradiomc_tpu.detector.detector import Detector
from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
from nuradiomc_tpu.utils import units

HERE = os.path.dirname(__file__)
REF = "/root/reference/NuRadioMC/test/SingleEvents"
INPUT = os.path.join(REF, "1e18_output_reference.hdf5")
INPUT_MB = os.path.join(REF, "MB_1e18_reference.hdf5")
DETECTOR_JSON = os.path.join(REF, "surface_station_1GHz.json")
GOLDEN = os.path.join(HERE, "golden", "singleevents_plain_reference.npz")
GOLDEN_MB = os.path.join(HERE, "golden", "singleevents_mb_reference.npz")

ANTENNAS = {"createLPDA_100MHz_InfFirn": "analytic_LPDA",
            "bicone_v8_InfFirn": "analytic_VPol"}

TRIGGERS = [
    TriggerSpec(name="simple_threshold", trigger_type="simple_threshold",
                threshold_high_sigma=3.0, number_of_coincidences=1),
    TriggerSpec(name="LPDA_2of4_4.1sigma", trigger_type="high_low",
                threshold_high_sigma=4.0, threshold_low_sigma=-4.0,
                channels=(0, 1, 2, 3), number_of_coincidences=2,
                requires="simple_threshold"),
    TriggerSpec(name="surface_dipoles_4of4_3sigma", trigger_type="high_low",
                threshold_high_sigma=3.0, threshold_low_sigma=-3.0,
                channels=(4, 5, 6, 7), number_of_coincidences=4,
                requires="simple_threshold"),
]


@pytest.mark.skipif(not (os.path.exists(GOLDEN) and os.path.exists(INPUT)),
                    reason="SingleEvents golden or reference input missing")
def test_singleevents_chain_matches_reference(tmp_path):
    golden = np.load(GOLDEN)
    names = [n.decode() for n in golden["trigger_names"]]

    sim = Simulation(
        INPUT,
        Detector(DETECTOR_JSON, default_station=101),
        config={"sampling_rate": 5.0, "noise": False,
                "speedup": {"minimum_weight_cut": 1e-5, "delta_C_cut": 0.698,
                            "min_efield_amplitude": 2},
                # focusing_mode "numeric" = the reference's dz=-1cm
                # displaced-receiver re-solve; this input has grazing
                # refracted rays at the surface dipoles where the implicit
                # dz->0 derivative and the finite difference regularize the
                # (divergent) caustic differently
                "propagation": {"ice_model": "ARAsim_southpole",
                                "focusing": True,
                                "focusing_mode": "numeric"},
                "signal": {"model": "Alvarez2000"},
                "trigger": {"noise_temperature": 300},
                "weights": {"weight_mode": "core_mantle_crust_simple"}},
        filter_chain=[
            FilterStage((80 * units.MHz, 1000 * units.GHz), "butter",
                        {"order": 2}),
            FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
        ],
        triggers=TRIGGERS,
        antenna_replacements={"createLPDA_100MHz_InfFirn": "analytic_LPDA",
                              "bicone_v8_InfFirn": "analytic_VPol"},
        chunk_size=32,
        dtype=jnp.float64,
        outputfilename=str(tmp_path / "singleevents_out.hdf5"),
    )
    res = sim.run()
    assert res["trigger_names"] == names

    # Vrms calibration parity (noise_temperature 300 K through the declared
    # filter chain at the 5 GHz internal rate)
    np.testing.assert_allclose(float(sim.Vrms), float(golden["Vrms"]),
                               rtol=1e-6)

    # reference rows are per shower; reduce to per-group decisions/times
    gid_ref = golden["group_ids"]
    mt_ref = golden["multiple_triggers"]
    tt_ref = golden["trigger_times"]
    w_ref = golden["weights"]
    groups = np.unique(gid_ref)

    gidx = {int(g): i for i, g in enumerate(res["group_ids"])}
    mt = np.asarray(res["multiple_triggers"])
    tt = np.asarray(res["trigger_times_per_trigger"])

    for g in groups:
        rows = np.where(gid_ref == g)[0]
        i = gidx[int(g)]
        for iT, name in enumerate(names):
            ref_fired = bool(np.any(mt_ref[rows, iT]))
            assert bool(mt[i, iT]) == ref_fired, (int(g), name)
            if ref_fired:
                t_ref = float(np.nanmin(tt_ref[rows, iT]))
                assert abs(float(tt[i, iT]) - t_ref) < 5.0, \
                    (int(g), name, float(tt[i, iT]), t_ref)
        # weights identical per group (same weight engine on both sides)
        np.testing.assert_allclose(res["weights"][i], w_ref[rows[0]],
                                   rtol=1e-6)

    # every golden group triggers on OUR side too, and no extras above the
    # weight cut among the input groups
    ours = set(int(g) for g in res["group_ids"][np.asarray(res["triggered"])])
    assert ours == set(int(g) for g in groups)

    # gating semantics: the ARIANNA-style triggers never fire without the
    # simple threshold (set_not_triggered parity)
    assert not np.any(mt[:, 1] & ~mt[:, 0])
    assert not np.any(mt[:, 2] & ~mt[:, 0])

    # per-(shower, channel) amplitude parity on station 101 from the output
    # schema, best over ray solutions (2% of peak, the waveform-e2e
    # tolerance), matched by shower id
    import h5py
    with h5py.File(sim.outputfilename) as f:
        st = f["station_101"]
        got_amp = np.asarray(st["max_amp_shower_and_ray"])
        got_sid = np.asarray(st["shower_id"])
    ref_amp = golden["station_101_max_amp_shower_and_ray"]
    ref_sid = golden["station_101_shower_id"]
    scale = float(np.nanmax(ref_amp))
    common = sorted(set(int(s) for s in ref_sid) &
                    set(int(s) for s in got_sid))
    assert common, "no common shower ids between golden and output"
    for sid in common:
        mine = np.nanmax(got_amp[got_sid == sid][0], axis=-1)   # [C]
        ref = np.nanmax(ref_amp[ref_sid == sid][0], axis=-1)
        both = np.isfinite(mine) & np.isfinite(ref)
        np.testing.assert_allclose(mine[both], ref[both],
                                   atol=0.02 * scale)


@pytest.mark.skipif(not (os.path.exists(GOLDEN_MB) and os.path.exists(INPUT_MB)),
                    reason="MB SingleEvents golden or reference input missing")
def test_singleevents_mooresbay_reflections_match_reference(tmp_path):
    """The reference's Moore's Bay SingleEvents CI variant (validate_MB.sh,
    config_MB.yaml): mooresbay_simple ice with a reflective bottom at
    -576 m, n_reflections=1 — the production pipeline widens the solution
    axis to 6 slots (2 base + 4 bounce) and applies bottom-bounce
    attenuation, surface Fresnel per touch, and the 0.82*exp(i*pi)
    reflection coefficient. Golden regenerated in-container with analytic
    antennas on both sides (tests/golden/generate_singleevents.py mb)."""
    golden = np.load(GOLDEN_MB)
    names = [n.decode() for n in golden["trigger_names"]]

    sim = Simulation(
        INPUT_MB,
        Detector(DETECTOR_JSON, default_station=101),
        config={"sampling_rate": 5.0, "noise": False,
                "split_event_time_diff": 1e3,
                "speedup": {"minimum_weight_cut": 1e-5,
                            "delta_C_cut": 0.3490658503988659,
                            "min_efield_amplitude": 2},
                "propagation": {"ice_model": "mooresbay_simple",
                                "n_reflections": 1},
                "signal": {"model": "Alvarez2000"},
                "trigger": {"noise_temperature": 300},
                "weights": {"weight_mode": "core_mantle_crust_simple"}},
        filter_chain=[
            FilterStage((80 * units.MHz, 1000 * units.GHz), "butter",
                        {"order": 2}),
            FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
        ],
        triggers=TRIGGERS,
        antenna_replacements=ANTENNAS,
        chunk_size=32,
        dtype=jnp.float64,
        outputfilename=str(tmp_path / "singleevents_mb_out.hdf5"),
    )
    res = sim.run()
    assert res["trigger_names"] == names
    np.testing.assert_allclose(float(sim.Vrms), float(golden["Vrms"]),
                               rtol=1e-6)

    gid_ref = golden["group_ids"]
    mt_ref = golden["multiple_triggers"]
    tt_ref = golden["trigger_times"]
    w_ref = golden["weights"]
    groups = np.unique(gid_ref)
    gidx = {int(g): i for i, g in enumerate(res["group_ids"])}
    mt = np.asarray(res["multiple_triggers"])
    tt = np.asarray(res["trigger_times_per_trigger"])

    # our solver finds case-2 bottom-bounce solutions the reference's
    # misses (verified against its own objective function in
    # tests/test_raytrace_mooresbay.py) — when such an extra REAL pulse
    # arrives before every reference solution and is above threshold, our
    # trigger time is legitimately earlier; accept it only with that
    # explicit justification from the recorded per-ray arrivals
    import h5py as _h5
    with _h5.File(sim.outputfilename) as f:
        st = f["station_101"]
        our_t_ray = np.asarray(st["time_shower_and_ray"])      # [rows,C,R]
        our_a_ray = np.asarray(st["max_amp_shower_and_ray"])
        our_gid_ray = np.asarray(st["event_group_id_per_shower"])

    ref_amp_ray = golden["station_101_max_amp_shower_and_ray"]
    ref_gid_ray = golden["station_101_event_group_id_per_shower"]
    spec_by_name = {t.name: t for t in TRIGGERS}
    vrms = float(golden["Vrms"])

    def extra_solution_justifies(g, name):
        """True iff WE fire because of genuine solutions absent from the
        reference's set: enough of the trigger's channels are pushed above
        its high threshold only once our extra per-ray pulses are counted
        (the reference's per-ray amps alone stay below coincidence)."""
        t = spec_by_name[name]
        chs = np.asarray(t.channels if t.channels else np.arange(8))
        sigma = float(t.threshold_high_sigma)
        need = int(t.number_of_coincidences)
        rr = np.where(our_gid_ray == g)[0]
        gr = np.where(ref_gid_ray == g)[0]
        if not len(rr) or not len(gr):
            return False
        ours_pass = int(np.sum(np.nanmax(
            np.where(np.isfinite(our_a_ray[rr][:, chs, :]),
                     our_a_ray[rr][:, chs, :], -np.inf),
            axis=(0, 2)) > sigma * vrms))
        refs_pass = int(np.sum(np.nanmax(
            np.where(np.isfinite(ref_amp_ray[gr][:, chs, :]),
                     ref_amp_ray[gr][:, chs, :], -np.inf),
            axis=(0, 2)) > sigma * vrms))
        return ours_pass >= need and refs_pass < need

    mismatches = []
    for g in groups:
        rows = np.where(gid_ref == g)[0]
        i = gidx[int(g)]
        for iT, name in enumerate(names):
            ref_fired = bool(np.any(mt_ref[rows, iT]))
            if bool(mt[i, iT]) != ref_fired:
                # our solver finds case-2 bottom-bounce solutions the
                # reference's root-finding heuristic misses (root PAIRS
                # below its optimize.root landing point fail its one-sided
                # sign checks, analyticraytracing.py:1520-1540; verified
                # against its own objective in tests/test_raytrace_
                # mooresbay.py) — a decision flip in OUR favor is accepted
                # only when those recorded extra pulses alone explain it
                if not (bool(mt[i, iT])
                        and extra_solution_justifies(int(g), name)):
                    mismatches.append((int(g), name))
                continue
            if ref_fired:
                t_ref = float(np.nanmin(tt_ref[rows, iT]))
                t_got = float(tt[i, iT])
                if abs(t_got - t_ref) < 5.0:
                    continue
                rr = np.where(our_gid_ray == g)[0]
                extra = (our_a_ray[rr] > 3.0 * float(golden["Vrms"])) \
                    & (our_t_ray[rr] < t_ref - 5.0)
                assert t_got < t_ref and np.any(extra), \
                    (int(g), name, t_got, t_ref)
        np.testing.assert_allclose(res["weights"][i], w_ref[rows[0]],
                                   rtol=1e-6)
    assert not mismatches, mismatches

    # triggered sets: every reference-triggered group must trigger here too;
    # extra groups are accepted ONLY when their above-threshold pulses sit
    # exclusively in case-2 bottom-bounce slots — the solution family the
    # reference's root finder drops entirely (verified against its own
    # obj_delta_y: for e.g. groups 23/107/120 the case-2 objective has a
    # root pair, find_solutions(reflection=1, reflection_case=2) returns [],
    # because both roots lie below its optimize.root landing point and its
    # one-sided bracket checks see no sign change). Our case-1/base slots
    # are pinned to the reference by the reference_C0 / MooresBay anchors,
    # so an extra trigger justified by case-1 or base slots would be OUR
    # bug and must fail.
    ours = set(int(g) for g in res["group_ids"][np.asarray(res["triggered"])])
    ref_trig = set(int(g) for g in groups)
    assert ref_trig <= ours, ref_trig - ours
    with _h5.File(sim.outputfilename) as f:
        st = f["station_101"]
        o_gid = np.asarray(st["event_group_id_per_shower"])
        o_amp = np.asarray(st["max_amp_shower_and_ray"])
        o_refl = np.asarray(st["ray_tracing_reflection"])
        o_case = np.asarray(st["ray_tracing_reflection_case"])
    thr = 3.0 * float(golden["Vrms"])
    for g in sorted(ours - ref_trig):
        rr = np.where(o_gid == g)[0]
        assert len(rr), g
        hot = np.nan_to_num(o_amp[rr]) > thr
        case2 = (np.nan_to_num(o_refl[rr]) >= 1) & (np.nan_to_num(o_case[rr]) == 2)
        assert np.any(hot), g
        assert not np.any(hot & ~case2), \
            (g, "above-threshold pulse outside case-2 bounce slots")

    # per-solution amplitude parity: every solution the REFERENCE found must
    # be matched by one of ours — same (C0, reflection, case) family, amp
    # within 2% of peak (we are a strict superset: our extra case-2 slots
    # have no reference counterpart by construction)
    import h5py
    with h5py.File(sim.outputfilename) as f:
        st = f["station_101"]
        got_amp = np.asarray(st["max_amp_shower_and_ray"])
        got_c0 = np.asarray(st["ray_tracing_C0"])
        got_refl = np.asarray(st["ray_tracing_reflection"])
        got_case = np.asarray(st["ray_tracing_reflection_case"])
        got_sid = np.asarray(st["shower_id"])
        # the 6-slot solution axis reaches the output schema
        assert got_c0.shape[-1] == 6
        assert np.nanmax(got_refl) == 1, "no bounce solutions recorded"
    ref_amp = golden["station_101_max_amp_shower_and_ray"]
    ref_c0 = golden["station_101_ray_tracing_C0"]
    ref_refl = golden["station_101_ray_tracing_reflection"]
    ref_case = golden["station_101_ray_tracing_reflection_case"]
    ref_sid = golden["station_101_shower_id"]
    scale = float(np.nanmax(ref_amp))
    n_matched = 0
    for sid in sorted(set(int(x) for x in ref_sid) &
                      set(int(x) for x in got_sid)):
        ir = np.where(ref_sid == sid)[0][0]
        ig = np.where(got_sid == sid)[0][0]
        C = ref_amp.shape[1]
        for c in range(C):
            for slot in range(ref_c0.shape[-1]):
                rc0 = ref_c0[ir, c, slot]
                if not np.isfinite(rc0):
                    continue
                cand = np.where(
                    np.isfinite(got_c0[ig, c])
                    & (np.abs(got_c0[ig, c] - rc0) < 1e-3 * abs(rc0))
                    & (got_refl[ig, c] == ref_refl[ir, c, slot]))[0]
                assert len(cand), (sid, c, slot, rc0)
                k = cand[0]
                if np.isfinite(ref_amp[ir, c, slot]):
                    np.testing.assert_allclose(
                        got_amp[ig, c, k], ref_amp[ir, c, slot],
                        atol=0.02 * scale)
                    n_matched += 1
    assert n_matched > 50, n_matched


GOLDEN_ARZ = os.path.join(HERE, "golden", "singleevents_arz_reference.npz")
MINILIB = os.path.join(HERE, "golden", "arz_minilib.pkl")

# recorded first-crossing cycle slips (group, trigger, ns); see comment in
# the test body
ALLOWED_ARZ_SLIPS = set()


@pytest.mark.skipif(not (os.path.exists(GOLDEN_ARZ) and os.path.exists(INPUT)),
                    reason="ARZ SingleEvents golden or reference input missing")
@pytest.mark.heavy
def test_singleevents_arz_matches_reference(tmp_path):
    """The reference's ARZ SingleEvents CI variant (validate_ARZ.sh,
    config_ARZ.yaml): the semi-MC ARZ2020 Askaryan model + the
    energy-dependent vertex-distance speedup cut. Both sides use the
    committed single-shower mini library (arz_minilib.pkl) so the
    stochastic profile pick is deterministic. Pins, on top of the plain
    chain: the fused ARZ vector-potential path, realization persistence,
    and the distance cut's 100 m floor + shower-energy-sum semantics
    (simulation.py:1399-1409, calculate_sim_efield:126-161)."""
    golden = np.load(GOLDEN_ARZ)
    names = [n.decode() for n in golden["trigger_names"]]

    sim = Simulation(
        INPUT,
        Detector(DETECTOR_JSON, default_station=101),
        config={"sampling_rate": 5.0, "noise": False,
                "speedup": {"minimum_weight_cut": 1e-5, "delta_C_cut": 0.698,
                            "min_efield_amplitude": 2,
                            "distance_cut": True},
                "propagation": {"ice_model": "ARAsim_southpole",
                                "focusing": True,
                                "focusing_mode": "numeric"},
                "signal": {"model": "ARZ2020"},
                "trigger": {"noise_temperature": 300},
                "weights": {"weight_mode": "core_mantle_crust_simple"}},
        filter_chain=[
            FilterStage((80 * units.MHz, 1000 * units.GHz), "butter",
                        {"order": 2}),
            FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
        ],
        triggers=TRIGGERS,
        antenna_replacements=ANTENNAS,
        arz_library_path=MINILIB,
        chunk_size=32,
        dtype=jnp.float64,
        outputfilename=str(tmp_path / "singleevents_arz_out.hdf5"),
    )
    res = sim.run()
    assert res["trigger_names"] == names
    np.testing.assert_allclose(float(sim.Vrms), float(golden["Vrms"]),
                               rtol=1e-6)

    gid_ref = golden["group_ids"]
    mt_ref = golden["multiple_triggers"]
    tt_ref = golden["trigger_times"]
    w_ref = golden["weights"]
    groups = np.unique(gid_ref)
    gidx = {int(g): i for i, g in enumerate(res["group_ids"])}
    mt = np.asarray(res["multiple_triggers"])
    tt = np.asarray(res["trigger_times_per_trigger"])

    # simple_threshold latches the FIRST |V| > threshold sample; on an ARZ
    # leading edge a few-permille trace difference (the model parity is
    # 2e-3 of peak, tests/test_arz.py) can slip that first crossing by a
    # cycle in either direction. Each allowed slip below is a recorded
    # borderline: every pulse in the golden's own per-ray record for these
    # groups sits at 0.6-1.5x threshold, so the crossing rides the leading
    # edge. Anything outside this recorded set fails.
    slips = []
    for g in groups:
        rows = np.where(gid_ref == g)[0]
        i = gidx[int(g)]
        for iT, name in enumerate(names):
            ref_fired = bool(np.any(mt_ref[rows, iT]))
            assert bool(mt[i, iT]) == ref_fired, (int(g), name)
            if ref_fired:
                t_ref = float(np.nanmin(tt_ref[rows, iT]))
                dt_trig = float(tt[i, iT]) - t_ref
                if abs(dt_trig) >= 5.0:
                    slips.append((int(g), name, round(dt_trig, 2)))
        np.testing.assert_allclose(res["weights"][i], w_ref[rows[0]],
                                   rtol=1e-6)
    assert set(slips) <= ALLOWED_ARZ_SLIPS, slips

    ours = set(int(g) for g in res["group_ids"][np.asarray(res["triggered"])])
    assert ours == set(int(g) for g in groups)

    # ARZ realization persistence: the deterministic single-shower pick
    import h5py
    with h5py.File(sim.outputfilename) as f:
        assert "shower_realization_ARZ" in f
        st = f["station_101"]
        got_amp = np.asarray(st["max_amp_shower_and_ray"])
        got_sid = np.asarray(st["shower_id"])
    ref_amp = golden["station_101_max_amp_shower_and_ray"]
    ref_sid = golden["station_101_shower_id"]
    scale = float(np.nanmax(ref_amp))
    common = sorted(set(int(s) for s in ref_sid) &
                    set(int(s) for s in got_sid))
    assert common, "no common shower ids between golden and output"
    for sid in common:
        mine = np.nanmax(got_amp[got_sid == sid][0], axis=-1)
        ref = np.nanmax(ref_amp[ref_sid == sid][0], axis=-1)
        both = np.isfinite(mine) & np.isfinite(ref)
        np.testing.assert_allclose(mine[both], ref[both],
                                   atol=0.02 * scale)
