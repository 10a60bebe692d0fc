"""Golden for the reference's SingleEvents CI chain (test/SingleEvents/
T02RunSimulation.py + validate.sh): a surface station (4 LPDAs + 4 dipoles,
two stations via default_detector_station=101) with THREE named triggers,
two of them gated on the first via set_not_triggered(not has_triggered(...))
(T02RunSimulation.py:36-61), on the reference's own committed 22-event
input (1e18_output_reference.hdf5 doubles as the input event list,
validate.sh:3).

The committed reference outputs were produced with the tabulated
createLPDA_100MHz_InfFirn / bicone_v8_InfFirn pickles (data-server
downloads), so this golden re-runs the reference in-container with the
analytic LPDA/VPol models substituted on BOTH sides — same physics, same
antennas, apples to apples (the same machinery as generate_e2e_golden.py).

Variants:
    plain  — config.yaml equivalent (ARAsim_southpole, focusing, Alvarez2000)
    mb     — config_MB.yaml equivalent (mooresbay_simple, n_reflections=1,
             split_event_time_diff=1e3)
    arz    — config_ARZ.yaml equivalent (validate_ARZ.sh: ARZ2020 +
             distance_cut), with the reference's ARZ class pointed at the
             committed single-shower mini library (arz_minilib.pkl, built
             from the repo's own raw AIRES profiles) so the stochastic
             library pick is deterministic on both sides

Run:  PYTHONPATH=/tmp/refstubs:/root/reference \
          python tests/golden/generate_singleevents.py [plain|mb|arz]
"""
import os
import sys

import numpy as np

import NuRadioReco.modules.trigger.highLowThreshold
import NuRadioReco.modules.trigger.simpleThreshold
import NuRadioReco.modules.channelBandPassFilter
from NuRadioReco.detector import antennapattern
from NuRadioReco.utilities import units
from NuRadioMC.simulation import simulation

# patch the provider CLASS (the singleton re-runs __init__ on every call)
_orig_init = antennapattern.AntennaPatternProvider.__init__

def _patched_init(self, *args, **kwargs):
    _orig_init(self, *args, **kwargs)
    self._antenna_model_replacements = {
        "createLPDA_100MHz_InfFirn": "analytic_LPDA",
        "bicone_v8_InfFirn": "analytic_VPol"}

antennapattern.AntennaPatternProvider.__init__ = _patched_init

highLow = NuRadioReco.modules.trigger.highLowThreshold.triggerSimulator()
simpleThr = NuRadioReco.modules.trigger.simpleThreshold.triggerSimulator()
bandpass = NuRadioReco.modules.channelBandPassFilter.channelBandPassFilter()


class mySimulation(simulation.simulation):
    # exactly test/SingleEvents/T02RunSimulation.py:28-61
    def _detector_simulation_filter_amp(self, evt, station, det):
        bandpass.run(evt, station, det,
                     passband=[80 * units.MHz, 1000 * units.GHz],
                     filter_type="butter", order=2)
        bandpass.run(evt, station, det,
                     passband=[0, 500 * units.MHz],
                     filter_type="butter", order=10)

    def _detector_simulation_trigger(self, evt, station, det):
        simpleThr.run(evt, station, det, threshold=3 * self._Vrms,
                      triggered_channels=None, number_concidences=1,
                      trigger_name="simple_threshold")
        gate = not station.has_triggered("simple_threshold")
        highLow.run(evt, station, det,
                    threshold_high=4 * self._Vrms,
                    threshold_low=-4 * self._Vrms,
                    triggered_channels=[0, 1, 2, 3],
                    number_concidences=2,
                    trigger_name="LPDA_2of4_4.1sigma",
                    set_not_triggered=gate)
        highLow.run(evt, station, det,
                    threshold_high=3 * self._Vrms,
                    threshold_low=-3 * self._Vrms,
                    triggered_channels=[4, 5, 6, 7],
                    number_concidences=4,
                    trigger_name="surface_dipoles_4of4_3sigma",
                    set_not_triggered=gate)


here = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference/NuRadioMC/test/SingleEvents"

variant = sys.argv[1] if len(sys.argv) > 1 else "plain"
import yaml
base_cfg = {
    "noise": False,
    "sampling_rate": 5.0,
    "speedup": {"minimum_weight_cut": 1e-5, "delta_C_cut": 0.698,
                "redo_raytracing": True,
                "time_res_efieldconverter": 0.01,
                "min_efield_amplitude": 2},
    "propagation": {"ice_model": "ARAsim_southpole", "focusing": True},
    "signal": {"model": "Alvarez2000"},
    "trigger": {"noise_temperature": 300},
    "weights": {"weight_mode": "core_mantle_crust_simple"},
}
if variant == "mb":
    base_cfg["split_event_time_diff"] = 1e3
    base_cfg["speedup"]["delta_C_cut"] = 0.3490658503988659
    base_cfg["propagation"] = {"ice_model": "mooresbay_simple",
                               "n_reflections": 1}
elif variant == "arz":
    base_cfg["signal"]["model"] = "ARZ2020"
    base_cfg["speedup"]["distance_cut"] = True
    # deterministic single-shower library (the published library_v1.2.pkl
    # is a data-server download; askaryan.py:120-122 builds ARZ() with the
    # default path, so patch the class)
    from NuRadioMC.SignalGen.ARZ import ARZ as ARZmod
    _arz_init = ARZmod.ARZ.__init__

    def _patched_arz_init(self, *args, **kwargs):
        kwargs.setdefault("library", os.path.join(here, "arz_minilib.pkl"))
        _arz_init(self, *args, **kwargs)

    ARZmod.ARZ.__init__ = _patched_arz_init

cfg_path = os.path.join(here, f"_singleevents_{variant}_config.yaml")
with open(cfg_path, "w") as f:
    yaml.safe_dump(base_cfg, f)

out_hdf5 = os.path.join(here, f"_singleevents_{variant}_output.hdf5")
# the MB variant uses its own committed shallow event list (zmin=-0.55 km,
# vertices must sit above the reflective bottom at -576 m; validate_MB.sh)
infile = ("MB_1e18_reference.hdf5" if variant == "mb"
          else "1e18_output_reference.hdf5")
sim = mySimulation(
    inputfilename=os.path.join(REF, infile),
    outputfilename=out_hdf5,
    detectorfile=os.path.join(REF, "surface_station_1GHz.json"),
    config_file=cfg_path,
    default_detector_station=101,
    file_overwrite=True)
sim.run()

import h5py
with h5py.File(out_hdf5) as f:
    payload = dict(
        group_ids=np.asarray(f["event_group_ids"]),
        triggered=np.asarray(f["triggered"]),
        multiple_triggers=np.asarray(f["multiple_triggers"]),
        trigger_times=np.asarray(f["trigger_times"]),
        trigger_names=np.asarray(f.attrs["trigger_names"], dtype="S"),
        weights=np.asarray(f["weights"]),
        Vrms=sim._Vrms, bandwidth=sim._bandwidth)
    for st in ("station_101", "station_102"):
        if st in f:
            for k, v in f[st].items():
                v = np.asarray(v)
                if v.dtype.kind in "fib" and v.size < 5_000_000:
                    payload[f"{st}_{k}"] = v
np.savez_compressed(
    os.path.join(here, f"singleevents_{variant}_reference.npz"), **payload)
print("golden written:", variant,
      "n_triggered =", int(payload["triggered"].sum()),
      "per-name =", payload["multiple_triggers"].sum(0))
