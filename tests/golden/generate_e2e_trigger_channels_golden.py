"""Separate-trigger-channel golden: run the REFERENCE simulation with a
DISTINCT trigger-channel response — each channel gets an extra trigger
channel (channel.set_trigger_channel, framework/channel.py:33-58) carrying
the same pre-amp voltage but a different (narrower) filter chain; the
high-low trigger reads the trigger channels (iter_trigger_channels,
highLowThreshold.py:249-255) while the readout keeps the standard chain.

Threshold = 2 x Vrms_trigger where Vrms_trigger is the thermal Vrms of the
TRIGGER chain's bandwidth (computed explicitly below with the same formula
both frameworks use), making the target independent of either framework's
internal calibration plumbing.

Run:  PYTHONPATH=/tmp/refstubs:/root/reference python tests/golden/generate_e2e_trigger_channels_golden.py
"""
import os

import numpy as np
import yaml

from NuRadioReco.detector import antennapattern

_orig_init = antennapattern.AntennaPatternProvider.__init__

def _patched_init(self, *args, **kwargs):
    _orig_init(self, *args, **kwargs)
    self._antenna_model_replacements = {
        "XFDTD_Vpol_CrossFeed_150mmHole_n1.78": "analytic_VPol"}

antennapattern.AntennaPatternProvider.__init__ = _patched_init

import NuRadioReco.modules.channelBandPassFilter
import NuRadioReco.modules.trigger.highLowThreshold
from NuRadioReco.framework.channel import Channel
from NuRadioReco.utilities import units
from NuRadioMC.simulation import simulation

channelBandPassFilter = NuRadioReco.modules.channelBandPassFilter.channelBandPassFilter()
triggerSimulatorHighLow = NuRadioReco.modules.trigger.highLowThreshold.triggerSimulator()

READOUT_CHAIN = [
    dict(passband=[80 * units.MHz, 1000 * units.GHz], filter_type="butter", order=2),
    dict(passband=[0, 500 * units.MHz], filter_type="butter", order=10),
]
# narrower trigger band (distinct response)
TRIGGER_CHAIN = [
    dict(passband=[120 * units.MHz, 1000 * units.GHz], filter_type="butter", order=4),
    dict(passband=[0, 300 * units.MHz], filter_type="butter", order=8),
]

# thermal Vrms of the trigger chain (identical formula on both sides)
_ff = np.linspace(0, 0.5 * 2.0, 10000)   # internal rate 2 GHz
_resp = np.ones_like(_ff, dtype=complex)
for st in TRIGGER_CHAIN:
    _resp *= channelBandPassFilter.get_filter(_ff, 0, 0, None, **st)
_bw_trigger = np.trapezoid(np.abs(_resp) ** 2, _ff)
from scipy import constants as _con
VRMS_TRIGGER = float(np.sqrt(300 * 50 * units.ohm * _bw_trigger
                             * (_con.Boltzmann * units.joule / units.kelvin)))


class mySimulation(simulation.simulation):
    def _detector_simulation_filter_amp(self, evt, station, det):
        # snapshot the pre-amp voltage into extra trigger channels
        for channel in station.iter_channels():
            tc = Channel(channel.get_id())
            tc.set_trace(np.array(channel.get_trace()),
                         channel.get_sampling_rate())
            tc.set_trace_start_time(channel.get_trace_start_time())
            channel.set_trigger_channel(tc)
        # readout chain on the main channels
        for st in READOUT_CHAIN:
            channelBandPassFilter.run(evt, station, det, **st)
        # distinct trigger chain on the trigger channels
        for channel in station.iter_channels():
            tc = channel.get_trigger_channel()
            ff = tc.get_frequencies()
            spec = tc.get_frequency_spectrum()
            for st in TRIGGER_CHAIN:
                spec = spec * channelBandPassFilter.get_filter(
                    np.asarray(ff), 0, 0, None, **st)
            tc.set_frequency_spectrum(spec, "same")

    def _detector_simulation_trigger(self, evt, station, det):
        triggerSimulatorHighLow.run(evt, station, det,
                                    threshold_high=2 * VRMS_TRIGGER,
                                    threshold_low=-2 * VRMS_TRIGGER,
                                    triggered_channels=None,
                                    number_concidences=1,
                                    trigger_name="highlow_trigchain")


here = os.path.dirname(os.path.abspath(__file__))
repo = os.path.dirname(os.path.dirname(here))
cfg_path = os.path.join(here, "_e2e_trigger_channels_config.yaml")
with open(cfg_path, "w") as f:
    yaml.safe_dump({
        "noise": False,
        "sampling_rate": 2.0,
        "speedup": {"minimum_weight_cut": 1e-5, "delta_C_cut": 0.698,
                    "redo_raytracing": True, "distance_cut": False},
        "propagation": {"ice_model": "southpole_2015"},
        "signal": {"model": "Alvarez2000"},
        "trigger": {"noise_temperature": 300},
        "weights": {"weight_mode": "core_mantle_crust_simple"},
    }, f)

out_hdf5 = os.path.join(here, "_e2e_trigger_channels_output.hdf5")
sim = mySimulation(
    inputfilename=os.path.join(repo, "tests/data/1e18_n3000.hdf5"),
    outputfilename=out_hdf5,
    detectorfile="/root/reference/NuRadioMC/test/Veff/dipole_100m.json",
    config_file=cfg_path,
    file_overwrite=True)
sim.run()

import h5py
with h5py.File(out_hdf5) as f:
    group_ids = np.asarray(f["event_group_ids"])
    triggered = np.asarray(f["triggered"])
    weights = np.asarray(f["weights"])
    maxamp = (np.asarray(f["station_101"]["maximum_amplitudes"])
              if "station_101" in f else np.zeros((0, 1)))
    np.savez_compressed(
        os.path.join(here, "e2e_trigger_channels_reference.npz"),
        group_ids=group_ids, triggered=triggered, weights=weights,
        st_maximum_amplitudes=maxamp,
        st_event_group_ids=(np.asarray(f["station_101"]["event_group_ids"])
                            if "station_101" in f else np.zeros(0)),
        vrms_trigger=VRMS_TRIGGER)
_, first = np.unique(group_ids, return_index=True)
print("trigger-channel golden written; n_triggered =",
      int(np.sum(triggered[first])), "Vrms_trigger =", VRMS_TRIGGER)
