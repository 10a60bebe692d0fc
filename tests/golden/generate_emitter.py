"""Golden for the reference's emitter-mode simulation chain
(simulation_mode='emitter', calculate_sim_efield_for_emitter,
simulation.py:299-460; the CI cal-pulser example
examples/05_pulser_calibration_measurement/SPICE_ARIANNA uses this path
with the efield_delta_pulse model).

A deterministic pulser event list (written here, committed) drives the
reference simulation on the SingleEvents surface station with analytic
antennas substituted on both sides, two named triggers.

Run:  PYTHONPATH=/tmp/refstubs:/root/reference \
          python tests/golden/generate_emitter.py
"""
import os

import numpy as np
import h5py

here = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference/NuRadioMC/test/SingleEvents"

# ---- deterministic pulser event lists (committed) ---------------------------
# Two variants: 'efield' (efield_delta_pulse — no emitting antenna) and
# 'voltage' (the measured hvsp1 lab waveform through a VPol emitting antenna,
# simulation.py:400-418). Select via EMITTER_VARIANT.
VARIANT = os.environ.get("EMITTER_VARIANT", "efield")
n = 24
depths = np.linspace(-200.0, -1500.0, n)
radii = np.linspace(60.0, 900.0, n)

if VARIANT == "efield":
    infile = os.path.join(here, "emitter_events.hdf5")
    golden_npz = "emitter_reference.npz"
    amps = np.geomspace(0.15, 15.0, n)                   # volts
    columns = {
        "emitter_model": np.array([b"efield_delta_pulse"] * n),
        "emitter_amplitudes": amps,
        "emitter_polarization": 0.1 * np.ones(n),
        "emitter_half_width": 1.0 * np.ones(n),
        "emitter_frequency": 0.3 * np.ones(n),
    }
else:
    infile = os.path.join(here, "emitter_voltage_events.hdf5")
    golden_npz = "emitter_voltage_reference.npz"
    amps = np.geomspace(1.0, 100.0, n)                   # volts into the antenna
    columns = {
        "emitter_model": np.array([b"hvsp1"] * n),
        "emitter_amplitudes": amps,
        "emitter_antenna_type": np.array([b"bicone_v8_InfFirn"] * n),
        "emitter_orientation_theta": np.zeros(n),
        "emitter_orientation_phi": np.zeros(n),
        "emitter_rotation_theta": np.full(n, np.pi / 2),
        "emitter_rotation_phi": np.zeros(n),
    }

with h5py.File(infile, "w") as f:
    f.attrs["simulation_mode"] = "emitter"
    f.attrs["n_events"] = n
    f.attrs["start_event_id"] = 0
    f["event_group_ids"] = np.arange(n)
    f["shower_ids"] = np.arange(n)
    for k, v in columns.items():
        f[k] = v
    f["xx"] = radii
    f["yy"] = np.zeros(n)
    f["zz"] = depths

if os.environ.get("WRITE_INPUT_ONLY"):
    raise SystemExit(0)

import NuRadioReco.modules.trigger.highLowThreshold
import NuRadioReco.modules.trigger.simpleThreshold
import NuRadioReco.modules.channelBandPassFilter
from NuRadioReco.detector import antennapattern
from NuRadioReco.utilities import units
from NuRadioMC.simulation import simulation

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
        highLow.run(evt, station, det,
                    threshold_high=2 * self._Vrms,
                    threshold_low=-2 * self._Vrms,
                    triggered_channels=[4, 5, 6, 7],
                    number_concidences=2,
                    trigger_name="dipoles_2of4_2sigma")


import yaml
cfg = {
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
cfg_path = os.path.join(here, "_emitter_config.yaml")
with open(cfg_path, "w") as f:
    yaml.safe_dump(cfg, f)

out_hdf5 = os.path.join(here, f"_emitter_{VARIANT}_output.hdf5")
sim = mySimulation(
    inputfilename=infile,
    outputfilename=out_hdf5,
    detectorfile=os.path.join(REF, "surface_station_1GHz.json"),
    config_file=cfg_path,
    default_detector_station=101,
    file_overwrite=True)
sim.run()

with h5py.File(out_hdf5) as f:
    payload = dict(
        group_ids=np.asarray(f["event_group_ids"]),
        triggered=np.asarray(f["triggered"]),
        multiple_triggers=np.asarray(f["multiple_triggers"]),
        trigger_times=np.asarray(f["trigger_times"]),
        trigger_names=np.asarray(f.attrs["trigger_names"], dtype="S"),
        Vrms=sim._Vrms, bandwidth=sim._bandwidth)
    for st in ("station_101",):
        if st in f:
            for k, v in f[st].items():
                v = np.asarray(v)
                if v.dtype.kind in "fib" and v.size < 5_000_000:
                    payload[f"{st}_{k}"] = v
np.savez_compressed(os.path.join(here, golden_npz), **payload)
print("golden written: n_triggered =", int(payload["triggered"].sum()),
      "per-name =", payload["multiple_triggers"].sum(0))
