"""Separate trigger-channel responses + per-channel filter chains in the
fused pipeline (channel.py:33-58 extra trigger channels;
validate_separate_trigger_channels.sh; per-channel amp_type responses).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from nuradiomc_tpu.sim import evtgen
from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
from nuradiomc_tpu.utils import units

HERE = os.path.dirname(__file__)
INPUT_3000 = os.path.join(HERE, "data", "1e18_n3000.hdf5")
GOLDEN = os.path.join(HERE, "golden", "e2e_trigger_channels_reference.npz")

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

READOUT_CHAIN = [
    FilterStage((80 * units.MHz, 1000 * units.GHz), "butter", {"order": 2}),
    FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
]
TRIGGER_CHAIN = [
    FilterStage((120 * units.MHz, 1000 * units.GHz), "butter", {"order": 4}),
    FilterStage((0, 300 * units.MHz), "butter", {"order": 8}),
]

CONFIG = {"sampling_rate": 2.0,
          "propagation": {"ice_model": "southpole_2015"},
          "signal": {"model": "Alvarez2000"},
          "weights": {"weight_mode": "core_mantle_crust_simple",
                      "cross_section_type": "ctw"}}


@pytest.fixture(scope="module")
def small_input(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tc") / "in.hdf5")
    evtgen.generate_eventlist_cylinder(
        path, 400, 1e18, 1e18,
        {"fiducial_rmin": 0, "fiducial_rmax": 3 * units.km,
         "fiducial_zmin": -2.7 * units.km, "fiducial_zmax": 0}, seed=21)
    return path


def _run(input_path, **kwargs):
    sim = Simulation(
        input_path, DIPOLE_DETECTOR, config=CONFIG,
        antenna_replacements={
            "XFDTD_Vpol_CrossFeed_150mmHole_n1.78": "analytic_VPol"},
        chunk_size=512, dtype=jnp.float64, **kwargs)
    return sim, sim.run()


def test_identical_trigger_chain_is_noop(small_input):
    """trigger_filter_chain == filter_chain must reproduce the plain run
    exactly (the reference CI's equality contract,
    validate_separate_trigger_channels.sh)."""
    _, res0 = _run(small_input, filter_chain=READOUT_CHAIN,
                   trigger=TriggerSpec(threshold_high_sigma=2.0,
                                       threshold_low_sigma=-2.0))
    sim1, res1 = _run(small_input, filter_chain=READOUT_CHAIN,
                      trigger_filter_chain=READOUT_CHAIN,
                      trigger=TriggerSpec(threshold_high_sigma=2.0,
                                          threshold_low_sigma=-2.0))
    assert sim1.Vrms_trigger == sim1.Vrms
    np.testing.assert_array_equal(res0["triggered"], res1["triggered"])
    np.testing.assert_allclose(res0["trigger_times"], res1["trigger_times"],
                               rtol=0, atol=0)
    np.testing.assert_allclose(res0["max_amplitude"], res1["max_amplitude"],
                               rtol=0, atol=0)


def test_distinct_trigger_chain(small_input):
    """A distinct (narrower) trigger chain: thresholds refer to the trigger
    chain's thermal Vrms; readout observables keep the readout chain."""
    sim0, res0 = _run(small_input, filter_chain=READOUT_CHAIN,
                      trigger=TriggerSpec(threshold_high_sigma=2.0,
                                          threshold_low_sigma=-2.0))
    sim1, res1 = _run(small_input, filter_chain=READOUT_CHAIN,
                      trigger_filter_chain=TRIGGER_CHAIN,
                      trigger=TriggerSpec(threshold_high_sigma=2.0,
                                          threshold_low_sigma=-2.0))
    # trigger Vrms is the thermal Vrms of the (narrower) trigger bandwidth
    assert sim1.bandwidth_trigger < sim1.bandwidth
    assert sim1.Vrms_trigger < sim1.Vrms
    # readout observables of commonly-triggered events are chain-independent
    both = res0["triggered"] & res1["triggered"]
    np.testing.assert_allclose(res1["max_amplitude"][both],
                               res0["max_amplitude"][both], rtol=0, atol=0)


@pytest.mark.skipif(not os.path.exists(GOLDEN),
                    reason="trigger-channel golden not generated")
def test_distinct_trigger_chain_matches_reference(tmp_path):
    """Golden e2e: the reference run with extra trigger channels carrying a
    narrower chain (generate_e2e_trigger_channels_golden.py) and this
    pipeline with trigger_filter_chain must find the same triggered set, the
    same trigger-chain Vrms, and the same READOUT-chain per-solution
    envelope amplitudes (max_amp_shower_and_ray — the convention the plain
    dipole e2e validates; the reference's windowed per-event
    maximum_amplitudes is a different observable)."""
    import h5py

    golden = np.load(GOLDEN)
    out = str(tmp_path / "tc_out.hdf5")
    sim, res = _run(INPUT_3000, filter_chain=READOUT_CHAIN,
                    trigger_filter_chain=TRIGGER_CHAIN,
                    trigger=TriggerSpec(name="highlow_trigchain",
                                        threshold_high_sigma=2.0,
                                        threshold_low_sigma=-2.0),
                    outputfilename=out)
    np.testing.assert_allclose(sim.Vrms_trigger, float(golden["vrms_trigger"]),
                               rtol=1e-9)
    min_w = 1e-5
    mine = set(res["group_ids"][(res["triggered"]) & (res["weights"] >= min_w)])
    ref = set(np.unique(golden["group_ids"]))
    assert mine == ref, (sorted(mine - ref), sorted(ref - mine))

    # per-(shower, ray) readout-chain envelope amplitudes by shower id
    with h5py.File(out) as f:
        sg = f["station_101"]
        my_sid = np.asarray(sg["shower_id"])
        my_amp = np.asarray(sg["max_amp_shower_and_ray"])
    ref_sid = golden["st_shower_id"]
    ref_amp = golden["st_max_amp_shower_and_ray"]
    for j, sid in enumerate(ref_sid):
        k = int(np.where(my_sid == sid)[0][0])
        have = ~np.isnan(ref_amp[j, 0])
        # 2e-2: the reference's own attenuation-quadrature accuracy floor
        # (scipy epsrel=1e-2), same as the dipole e2e amplitude tolerance
        np.testing.assert_allclose(my_amp[k, 0][have], ref_amp[j, 0][have],
                                   rtol=2e-2, err_msg=f"shower {sid}")


def test_per_channel_filter_chains(small_input):
    """FilterStage.channels routes stages to channel subsets: each channel
    gets its own response and its own thermal Vrms / noise normalization."""
    det = {
        "channels": {
            "1": dict(DIPOLE_DETECTOR["channels"]["1"]),
            "2": dict(DIPOLE_DETECTOR["channels"]["1"],
                      channel_id=1, ant_position_z=-105.0),
        },
        "stations": DIPOLE_DETECTOR["stations"],
    }
    chain = [
        FilterStage((80 * units.MHz, 1000 * units.GHz), "butter", {"order": 2}),
        # 500 MHz lowpass only on channel 0; 300 MHz lowpass only on channel 1
        FilterStage((0, 500 * units.MHz), "butter", {"order": 10},
                    channels=(0,)),
        FilterStage((0, 300 * units.MHz), "butter", {"order": 10},
                    channels=(1,)),
    ]
    sim = Simulation(
        small_input, det, config=CONFIG, filter_chain=chain,
        trigger=TriggerSpec(threshold_high_sigma=2.0,
                            threshold_low_sigma=-2.0),
        antenna_replacements={
            "XFDTD_Vpol_CrossFeed_150mmHole_n1.78": "analytic_VPol"},
        chunk_size=512, dtype=jnp.float64)
    # distinct per-channel responses and bandwidths
    fr = np.asarray(sim.channel_params.filter_response)
    assert not np.allclose(fr[0], fr[1])
    assert sim.bandwidth_per_channel[1] < sim.bandwidth_per_channel[0]
    assert sim.Vrms_per_channel[1] < sim.Vrms_per_channel[0]
    na = np.asarray(sim.channel_params.noise_amplitude)
    assert na[0] != na[1]
    res = sim.run()   # end-to-end run with heterogeneous chains
    assert res["triggered"].shape == res["weights"].shape
