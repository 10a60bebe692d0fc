"""Golden end-to-end run: execute the REFERENCE simulation on the committed
3000-event input with the analytic_VPol antenna substituted for the
unavailable XFDTD table, and record per-event-group trigger decisions,
weights and Veff. This is the apples-to-apples conformance target for
tests/test_e2e.py (same physics, same antenna on both sides).

Run:  PYTHONPATH=/tmp/refstubs:/root/reference python tests/golden/generate_e2e_golden.py
"""
import os
import sys

import numpy as np

import NuRadioReco.modules.trigger.highLowThreshold
import NuRadioReco.modules.channelBandPassFilter
from NuRadioReco.detector import antennapattern
from NuRadioReco.utilities import units
from NuRadioMC.simulation import simulation

# substitute the analytic VPol for the unavailable table model. The provider
# is a singleton whose __init__ re-runs (and resets the replacement dict) on
# every construction, so patch the class __init__ itself.
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

import yaml
cfg_path = os.path.join(here, "_e2e_config.yaml")
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

out_hdf5 = os.path.join(here, "_e2e_reference_output.hdf5")
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
    maxamp = np.asarray(f["station_101"]["maximum_amplitudes"]) if "station_101" in f else None
    veff = float(f.attrs["volume"]) * float(np.sum(weights[triggered])) / f.attrs["n_events"] \
        if "volume" in f.attrs else np.nan
    keys = {k: np.asarray(v) for k, v in f["station_101"].items()} if "station_101" in f else {}
    np.savez_compressed(
        os.path.join(here, "e2e_reference.npz"),
        group_ids=group_ids, triggered=triggered, weights=weights,
        Vrms=sim._Vrms, bandwidth=sim._bandwidth,
        **{f"st_{k}": v for k, v in keys.items()
           if v.dtype.kind in "fib" and v.size < 5_000_000})
print("golden e2e written; n_triggered =", int(np.sum(triggered[np.unique(group_ids, return_index=True)[1]])))
