"""Trigger-chain anchor: reproduce the reference's trigger_tests regression
(NuRadioReco/test/trigger_tests/{trigger_tests,compare_to_reference}.py) on
its own committed eventlist + detector.

`tests/golden/trigger_test_input.nur` was produced by the REFERENCE
simulation on the reference's committed trigger_test_eventlist.hdf5 (with the
unavailable tabulated bicone replaced by analytic_VPol on BOTH sides);
`tests/golden/trigger_anchor.json` holds the reference trigger-module results
(see generate_trigger_anchor.py). Here the same chain runs on OUR modules:
reference-.nur reader -> efieldToVoltageConverter -> ARIANNA hardware
response -> simple/highLow/multiHighLow/beamformed-PA triggers, compared per
compare_to_reference.py:16-45 (exact triggered/channels, allclose times).
"""
import json
import os

import numpy as np
import pytest

from nuradiomc_tpu.detector.detector import Detector
from nuradiomc_tpu.detector.hardware_response import hardwareResponseIncorporator
from nuradiomc_tpu.reco import efield_converters as ec
from nuradiomc_tpu.reco import trigger_modules as tm
from nuradiomc_tpu.sim import io_nur_reference as rio
from nuradiomc_tpu.utils import units

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REPLACEMENTS = {"bicone_v8_InfFirn": "analytic_VPol"}


@pytest.fixture(scope="module")
def results():
    det = Detector(os.path.join(GOLDEN_DIR, "trigger_test_detector.json"))
    reader = rio.NuRadioRecoio(os.path.join(GOLDEN_DIR,
                                            "trigger_test_input.nur"))

    conv = ec.efieldToVoltageConverter()
    conv.begin(antenna_replacements=REPLACEMENTS)
    hardware = hardwareResponseIncorporator()
    simple = tm.triggerSimulatorSimple()
    high_low = tm.triggerSimulatorHighLow()
    multi = tm.triggerSimulatorMultiHighLow()
    phased = tm.BeamformedPowerIntegrationTrigger()
    phased.begin()

    out = {}
    for event in reader.get_events():
        station = event.get_station(1)
        for chid in list(station.get_channel_ids()):
            station.remove_channel(chid)
        conv.run(event, station, det)
        hardware.run(event, station, det, sim_to_data=True)
        high_low.run(event, station, det, threshold_high=40 * units.mV,
                     threshold_low=-40 * units.mV)
        multi.run(event, station, det, trigger_name="default_multi_high_low",
                  threshold_high=40 * units.mV, threshold_low=-40 * units.mV,
                  n_high_lows=2)
        simple.run(event, station, det)
        phased.run(event, station, det, Vrms=1, threshold=40 * units.mV)

        for name in ("default_simple_threshold", "default_high_low",
                     "default_multi_high_low", "simple_phased_threshold"):
            trig = station.get_trigger(name)
            d = out.setdefault(name, {"triggered": [], "trigger_time": [],
                                      "triggered_channels": []})
            d["triggered"].append(bool(trig.has_triggered()))
            tt = trig.get_trigger_time()
            d["trigger_time"].append(None if tt is None else float(tt))
            d["triggered_channels"].append(
                [int(c) for c in (trig.get_triggered_channels() or [])])
    return out


@pytest.fixture(scope="module")
def reference():
    with open(os.path.join(GOLDEN_DIR, "trigger_anchor.json")) as f:
        return json.load(f)


@pytest.mark.parametrize("name", ["default_simple_threshold",
                                  "default_high_low",
                                  "default_multi_high_low",
                                  "simple_phased_threshold"])
def test_triggered_decisions_match(results, reference, name):
    assert results[name]["triggered"] == reference[name]["triggered"]


@pytest.mark.parametrize("name", ["default_simple_threshold",
                                  "default_high_low",
                                  "default_multi_high_low",
                                  "simple_phased_threshold"])
def test_triggered_channels_match(results, reference, name):
    got = results[name]["triggered_channels"]
    want = [sorted(x) if x else [] for x in reference[name]["triggered_channels"]]
    assert [sorted(x) for x in got] == want


@pytest.mark.parametrize("name", ["default_simple_threshold",
                                  "default_high_low",
                                  "default_multi_high_low",
                                  "simple_phased_threshold"])
def test_trigger_times_match(results, reference, name):
    got = np.array([t if t is not None else np.nan
                    for t in results[name]["trigger_time"]], dtype=float)
    want = np.array([t if t is not None else np.nan
                     for t in reference[name]["trigger_time"]], dtype=float)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    m = ~np.isnan(want)
    np.testing.assert_allclose(got[m], want[m], rtol=1e-9, atol=1e-6)
