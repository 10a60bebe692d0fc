"""Multi-trigger orchestration: N named triggers evaluated in ONE fused pass.

The reference registers many named triggers per station per run
(T02RunPhasedRNO.py:76-109) and writes a per-trigger-name
``multiple_triggers`` matrix (output_writer_hdf5.py:350-381). These tests
check (a) self-consistency of the one-pass evaluation against single-trigger
runs, and (b) the per-trigger triggered sets against a reference golden
generated with three named triggers (high-low, channel-subset simple
threshold, phased array) in one pass
(tests/golden/generate_e2e_multitrigger_golden.py).
"""
import os

import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
from nuradiomc_tpu.utils import units

HERE = os.path.dirname(__file__)
INPUT = os.path.join(HERE, "data", "1e18_n3000.hdf5")
GOLDEN = os.path.join(HERE, "golden", "e2e_multitrigger_reference.npz")

DIPOLE_DETECTOR = {
    "channels": {"1": {
        "adc_n_samples": 256, "adc_sampling_frequency": 1.0,
        "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
        "ant_position_x": 0.0, "ant_position_y": 0.0, "ant_position_z": -100.0,
        "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
        "ant_type": "XFDTD_Vpol_CrossFeed_150mmHole_n1.78",
        "amp_type": "300", "cab_time_delay": 19.8, "adc_nbits": None,
        "channel_id": 0, "station_id": 101,
    }},
    "stations": {"1": {
        "pos_altitude": 0, "pos_easting": 0, "pos_northing": 0,
        "pos_site": "southpole", "station_id": 101,
    }},
}

PA_DETECTOR = {
    "channels": {str(i + 1): {
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
                       "pos_easting": 0, "pos_northing": 0}},
}


def test_threshold_ladder_one_pass(tmp_path):
    """A 3-step threshold ladder in one simulation: per-name columns must
    be consistent (higher thresholds trigger subsets) and column 0 must
    equal a dedicated single-trigger run — the threshold-ladder workflow
    that previously needed N full re-simulations."""
    out = str(tmp_path / "ladder.hdf5")
    common = dict(
        config={"sampling_rate": 2.0,
                "propagation": {"ice_model": "southpole_2015"},
                "signal": {"model": "Alvarez2000"},
                "weights": {"weight_mode": "core_mantle_crust_simple",
                            "cross_section_type": "ctw"}},
        filter_chain=[
            FilterStage((80 * units.MHz, 1000 * units.GHz), "butter", {"order": 2}),
            FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
        ],
        antenna_replacements={
            "XFDTD_Vpol_CrossFeed_150mmHole_n1.78": "analytic_VPol"},
        chunk_size=512,
        dtype=jnp.float64,
    )
    ladder = [
        TriggerSpec(name=f"hilo_{s:g}sig", threshold_high_sigma=s,
                    threshold_low_sigma=-s)
        for s in (2.0, 2.5, 3.0)
    ]
    sim = Simulation(INPUT, DIPOLE_DETECTOR, triggers=ladder,
                     outputfilename=out, **common)
    res = sim.run()

    mt = res["multiple_triggers"]                       # [G, 3]
    assert mt.shape[1] == 3
    assert res["trigger_names"] == ["hilo_2sig", "hilo_2.5sig", "hilo_3sig"]
    # ladder monotonicity: a 3 sigma trigger implies 2.5 and 2 sigma
    assert not np.any(mt[:, 2] & ~mt[:, 1])
    assert not np.any(mt[:, 1] & ~mt[:, 0])
    # OR column == overall triggered
    np.testing.assert_array_equal(np.any(mt, axis=1), res["triggered"])
    # per-trigger Veff ordering
    v = res["veff_per_trigger"]
    assert v["hilo_2sig"] >= v["hilo_2.5sig"] >= v["hilo_3sig"] > 0

    # the lowest rung equals a dedicated single-trigger simulation
    sim1 = Simulation(INPUT, DIPOLE_DETECTOR,
                      trigger=TriggerSpec(threshold_high_sigma=2.0,
                                          threshold_low_sigma=-2.0),
                      **common)
    res1 = sim1.run()
    np.testing.assert_array_equal(mt[:, 0], res1["triggered"])
    np.testing.assert_allclose(v["hilo_2sig"], res1["veff"], rtol=1e-12)

    # ---- output schema: multiple_triggers / trigger_names / trigger_times
    with h5py.File(out) as f:
        names = [n.decode() for n in f.attrs["trigger_names"]]
        assert names == ["hilo_2sig", "hilo_2.5sig", "hilo_3sig"]
        mt_sh = np.asarray(f["multiple_triggers"])
        tt_sh = np.asarray(f["trigger_times"])
        assert mt_sh.shape[1] == 3 and tt_sh.shape[1] == 3
        # per-trigger times finite exactly where triggered
        assert np.all(np.isfinite(tt_sh[mt_sh]))
        assert np.all(np.isnan(tt_sh[~mt_sh]))
        sg = f["station_101"]
        assert np.asarray(sg["multiple_triggers"]).shape[1] == 3

    # per-trigger Veff via the post-processing layer
    from nuradiomc_tpu.sim import veff as veff_util
    post = veff_util.get_Veff_Aeff_single(
        out, trigger_combinations={
            "two_or_three": {"triggers": ["hilo_2.5sig", "hilo_3sig"]},
            "two_not_three": {"triggers": ["hilo_2sig"],
                              "notriggers": ["hilo_3sig"]}})
    # rtol: the in-run Veff zeroes sub-minimum_weight_cut weights (speedup
    # config) while the post-processing layer, like the reference Veff.py,
    # sums raw weights — a ~1e-8 relative difference on this input
    for name in names:
        np.testing.assert_allclose(post["veffs"][name][0], v[name], rtol=1e-6)
    # 2.5 OR 3 == 2.5 (superset)
    np.testing.assert_allclose(post["veffs"]["two_or_three"][0],
                               v["hilo_2.5sig"], rtol=1e-6)
    assert post["veffs"]["two_not_three"][0] <= v["hilo_2sig"]


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="multi-trigger golden not generated")
@pytest.mark.heavy
def test_three_named_triggers_match_reference():
    """Three named triggers (high-low all channels, simple threshold on a
    channel SUBSET, phased array) in one pass reproduce the reference's
    per-trigger-name triggered sets on the deterministic noiseless pinned-k_L
    input."""
    golden = np.load(GOLDEN)
    names = [n.decode() for n in golden["trigger_names"]]
    sim = Simulation(
        os.path.join(HERE, "golden", "pa_noiseless_input.hdf5"),
        PA_DETECTOR,
        config={"sampling_rate": 2.0, "noise": False,
                "propagation": {"ice_model": "southpole_2015", "focusing": True},
                "signal": {"model": "Alvarez2009"},
                "weights": {"weight_mode": "core_mantle_crust_simple",
                            "cross_section_type": "ctw"}},
        filter_chain=[
            FilterStage((96 * units.MHz, 100 * units.GHz), "cheby1",
                        {"order": 4, "rp": 0.1}),
            FilterStage((0, 220 * units.MHz), "cheby1", {"order": 7, "rp": 0.1}),
        ],
        triggers=[
            TriggerSpec(name="hilo_2sig", trigger_type="high_low",
                        threshold_high_sigma=2.0, threshold_low_sigma=-2.0),
            TriggerSpec(name="simple_3sig", trigger_type="simple_threshold",
                        channels=(0, 1), threshold_high_sigma=3.0),
            TriggerSpec(name="PA_4channel", trigger_type="phased_array"),
        ],
        antenna_replacements={"RNOG_vpol_v1_n1.73": "analytic_VPol"},
        chunk_size=512,
        dtype=jnp.float64,
    )
    res = sim.run()
    assert res["trigger_names"] == names

    gid_ref = golden["group_ids"]
    mt_ref = golden["multiple_triggers"]
    tt_ref = golden["trigger_times"]
    w_ok = res["weights"] >= 1e-5
    gidx = {int(g): i for i, g in enumerate(res["group_ids"])}
    for iT, name in enumerate(names):
        mine = set(int(g) for g in
                   res["group_ids"][res["multiple_triggers"][:, iT] & w_ok])
        ref = set(int(g) for g in np.unique(gid_ref[mt_ref[:, iT]]))
        # same borderline budget as the single-trigger noiseless PA e2e
        # (group 1628 sits 1.9% below the PA power threshold; amplitude-level
        # ~1% reference quadrature accuracy): at most one borderline
        # difference per trigger name
        extra, missing = mine - ref, ref - mine
        assert len(extra) + len(missing) <= 1, (name, sorted(extra),
                                                sorted(missing))

        # per-trigger-name trigger times of commonly-triggered groups
        # (output_writer_hdf5 trigger_times columns). Bin-exact 1-ns parity
        # is pinned by the single-channel waveform e2e
        # (tests/test_e2e_waveforms.py); for this 4-channel multi-ray deep
        # station the reference's voltage-trace-start event splitting and
        # window-start conventions shift times by up to ~-19 ns (we
        # evaluate the merged group trace, measured distribution in the
        # test history), so this pins the times at the convention level
        tol = 25.0 if name == "PA_4channel" else 15.0
        for g in sorted(mine & ref):
            rows = np.where(gid_ref == g)[0]
            t_ref = float(np.nanmin(tt_ref[rows, iT]))
            t_got = float(res["trigger_times_per_trigger"][gidx[g], iT])
            assert abs(t_got - t_ref) < tol, (name, g, t_got, t_ref)
