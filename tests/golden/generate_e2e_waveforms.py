"""Waveform-level e2e golden: rerun the REFERENCE simulation of
generate_e2e_golden.py (same input, config, analytic_VPol antenna) with a
.nur event output, so the voltage traces of the triggered events become a
conformance target (mirrors the reference's own SingleEvents
T04validate_allmost_equal waveform check).

Run:
    python tests/golden/make_refstubs.py
    PYTHONPATH=/tmp/refstubs:/root/reference python tests/golden/generate_e2e_waveforms.py
"""
import os

import numpy as np

import NuRadioReco.modules.trigger.highLowThreshold
import NuRadioReco.modules.channelBandPassFilter
from NuRadioReco.detector import antennapattern
from NuRadioReco.utilities import units
from NuRadioMC.simulation import simulation

_orig_init = antennapattern.AntennaPatternProvider.__init__


def _patched_init(self, *args, **kwargs):
    _orig_init(self, *args, **kwargs)
    self._antenna_model_replacements = {
        "XFDTD_Vpol_CrossFeed_150mmHole_n1.78": "analytic_VPol"}


antennapattern.AntennaPatternProvider.__init__ = _patched_init

triggerSimulatorHighLow = NuRadioReco.modules.trigger.highLowThreshold.triggerSimulator()
channelBandPassFilter = NuRadioReco.modules.channelBandPassFilter.channelBandPassFilter()


class mySimulation(simulation.simulation):
    def _detector_simulation_filter_amp(self, evt, station, det):
        channelBandPassFilter.run(evt, station, det,
                                  passband=[80 * units.MHz, 1000 * units.GHz],
                                  filter_type="butter", order=2)
        channelBandPassFilter.run(evt, station, det,
                                  passband=[0, 500 * units.MHz],
                                  filter_type="butter", order=10)

    def _detector_simulation_trigger(self, evt, station, det):
        triggerSimulatorHighLow.run(evt, station, det,
                                    threshold_high=2 * self._Vrms,
                                    threshold_low=-2 * self._Vrms,
                                    triggered_channels=None,
                                    number_concidences=1,
                                    trigger_name="highlow_2sigma")


here = os.path.dirname(os.path.abspath(__file__))
repo = os.path.dirname(os.path.dirname(here))
out_nur = os.path.join(here, "e2e_reference_waveforms.nur")

sim = mySimulation(
    inputfilename=os.path.join(repo, "tests/data/1e18_n3000.hdf5"),
    outputfilename=os.path.join(here, "_e2e_waveforms_output.hdf5"),
    detectorfile="/root/reference/NuRadioMC/test/Veff/dipole_100m.json",
    outputfilenameNuRadioReco=out_nur,
    config_file=os.path.join(here, "_e2e_config.yaml"),
    file_overwrite=True)
sim.run()
print("wrote", out_nur, os.path.getsize(out_nur), "bytes")
