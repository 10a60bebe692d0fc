"""Trigger-chain anchor: run the reference's OWN trigger regression chain
(NuRadioReco/test/trigger_tests) with the bicone antenna replaced by the
analytic VPol (the tabulated bicone pattern is a data-server download), and
commit both the intermediate event file and the trigger results:

1. generate_events.py equivalent -> tests/golden/trigger_test_input.nur
   (reference simulation on the COMMITTED trigger_test_eventlist.hdf5 +
   trigger_test_detector.json + config.yaml)
2. trigger_tests.py equivalent   -> tests/golden/trigger_anchor.json
   (efieldToVoltageConverter + ARIANNA hardwareResponseIncorporator +
   highLow / multiHighLow / simpleThreshold / beamformedPowerIntegration)

Our side (tests/test_trigger_anchor.py) reads trigger_test_input.nur with the
reference-.nur reader and must reproduce trigger_anchor.json exactly
(compare_to_reference.py:16-45 semantics).

Run:
    python tests/golden/make_refstubs.py
    PYTHONPATH=/tmp/refstubs:/root/reference python tests/golden/generate_trigger_anchor.py
"""
import json
import os

import numpy as np

from NuRadioReco.detector import antennapattern

_orig_init = antennapattern.AntennaPatternProvider.__init__


def _patched_init(self, *args, **kwargs):
    _orig_init(self, *args, **kwargs)
    self._antenna_model_replacements = {
        "bicone_v8_InfFirn": "analytic_VPol"}


antennapattern.AntennaPatternProvider.__init__ = _patched_init

import NuRadioReco.modules.trigger.simpleThreshold
import NuRadioReco.modules.trigger.highLowThreshold
import NuRadioReco.modules.trigger.multiHighLowThreshold
import NuRadioReco.modules.phasedarray.beamformedPowerIntegrationTrigger
import NuRadioReco.modules.efieldToVoltageConverter
import NuRadioReco.modules.ARIANNA.hardwareResponseIncorporator
import NuRadioReco.modules.io.eventReader
import NuRadioReco.modules.io.eventWriter
import NuRadioReco.detector.detector
from NuRadioReco.utilities import units
from NuRadioMC.simulation import simulation

here = os.path.dirname(os.path.abspath(__file__))
ref_dir = "/root/reference/NuRadioReco/test/trigger_tests"
input_nur = os.path.join(here, "trigger_test_input.nur")

# ---- step 1: reference simulation -> trigger_test_input.nur -----------------
if os.environ.get("SKIP_SIM") and os.path.exists(input_nur):
    print("reusing existing", input_nur)
else:
    simpleThreshold = NuRadioReco.modules.trigger.simpleThreshold.triggerSimulator()

    class mySimulation(simulation.simulation):

        def _detector_simulation_filter_amp(self, evt, station, det):
            pass

        def _detector_simulation_trigger(self, evt, station, det):
            simpleThreshold.run(evt, station, det, threshold=3 * self._Vrms,
                                triggered_channels=None, number_concidences=1,
                                trigger_name="simple_threshold")

    sim = mySimulation(
        inputfilename=os.path.join(ref_dir, "trigger_test_eventlist.hdf5"),
        outputfilename=os.path.join(here, "_trigger_test_output.hdf5"),
        detectorfile=os.path.join(ref_dir, "trigger_test_detector.json"),
        outputfilenameNuRadioReco=input_nur,
        config_file=os.path.join(ref_dir, "config.yaml"),
        file_overwrite=True)
    sim.run()
    print("wrote", input_nur)

# ---- step 2: trigger chain -> trigger_anchor.json ---------------------------
import datetime

det = NuRadioReco.detector.detector.Detector(
    json_filename=os.path.join(ref_dir, "trigger_test_detector.json"),
    antenna_by_depth=False)
det.update(datetime.datetime(2018, 10, 1))

event_reader = NuRadioReco.modules.io.eventReader.eventReader()
event_reader.begin(input_nur)

high_low = NuRadioReco.modules.trigger.highLowThreshold.triggerSimulator()
multi_high_low = NuRadioReco.modules.trigger.multiHighLowThreshold.triggerSimulator()
simple = NuRadioReco.modules.trigger.simpleThreshold.triggerSimulator()
phased = NuRadioReco.modules.phasedarray.beamformedPowerIntegrationTrigger \
    .BeamformedPowerIntegrationTrigger()
conv = NuRadioReco.modules.efieldToVoltageConverter.efieldToVoltageConverter()
conv.begin()
hardware = NuRadioReco.modules.ARIANNA.hardwareResponseIncorporator \
    .hardwareResponseIncorporator()

trigger_names = ["default_simple_threshold", "default_high_low",
                 "default_multi_high_low", "simple_phased_threshold"]
results = {}
for event in event_reader.run():
    station = event.get_station(1)
    for chid in list(station.get_channel_ids()):
        station.remove_channel(chid)
    conv.run(event, station, det)
    hardware.run(event, station, det, True)
    high_low.run(event, station, det, threshold_high=40 * units.mV,
                 threshold_low=-40 * units.mV)
    multi_high_low.run(event, station, det,
                       trigger_name="default_multi_high_low",
                       threshold_high=40 * units.mV,
                       threshold_low=-40 * units.mV, n_high_lows=2)
    simple.run(event, station, det)
    phased.run(event, station, det, Vrms=1, threshold=40 * units.mV)

    for name in trigger_names:
        trig = station.get_trigger(name)
        results.setdefault(name, {"triggered": [], "trigger_time": [],
                                  "triggered_channels": []})
        settings = trig.get_trigger_settings()
        for prop in ("triggered", "trigger_time", "triggered_channels"):
            val = settings[prop]
            if isinstance(val, np.ndarray):
                val = val.tolist()
            if isinstance(val, (np.floating, np.integer, np.bool_)):
                val = val.item()
            results[name][prop].append(val)

with open(os.path.join(here, "trigger_anchor.json"), "w") as f:
    json.dump(results, f, sort_keys=True, indent=2)
print("wrote trigger_anchor.json:",
      {k: v["triggered"] for k, v in results.items()})
