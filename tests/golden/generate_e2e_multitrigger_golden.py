"""Multi-trigger golden: run the REFERENCE simulation with THREE named
triggers registered in one pass — the reference's standard workflow
(T02RunPhasedRNO.py:76-109 registers eight) — on the deterministic noiseless
PA setup (pinned Alvarez2009 k_L input, 4-channel single_pa_200m detector):

  1. ``hilo_2sig``     high-low +-2 sigma on all 4 channels
  2. ``simple_3sig``   simple threshold 3 sigma on channels [0, 1] only
  3. ``PA_4channel``   11-beam phased-array power trigger, 2x upsampling

and record the per-trigger-name ``multiple_triggers`` matrix +
``trigger_names`` + per-trigger ``trigger_times``
(output_writer_hdf5.py:350-381). Conformance target for
tests/test_e2e_multitrigger.py.

Run:  PYTHONPATH=/tmp/refstubs:/root/reference python tests/golden/generate_e2e_multitrigger_golden.py
"""
import os

import numpy as np
import yaml

from NuRadioReco.detector import antennapattern

_orig_init = antennapattern.AntennaPatternProvider.__init__

def _patched_init(self, *args, **kwargs):
    _orig_init(self, *args, **kwargs)
    self._antenna_model_replacements = {"RNOG_vpol_v1_n1.73": "analytic_VPol"}

antennapattern.AntennaPatternProvider.__init__ = _patched_init

import NuRadioReco.modules.channelBandPassFilter
import NuRadioReco.modules.phasedarray.phasedArrayTrigger
import NuRadioReco.modules.trigger.highLowThreshold
import NuRadioReco.modules.trigger.simpleThreshold
from NuRadioReco.utilities import units
from NuRadioMC.simulation import simulation

channelBandPassFilter = NuRadioReco.modules.channelBandPassFilter.channelBandPassFilter()
phasedArrayTrigger = NuRadioReco.modules.phasedarray.phasedArrayTrigger.PhasedArrayTrigger()
highLowTrigger = NuRadioReco.modules.trigger.highLowThreshold.triggerSimulator()
simpleTrigger = NuRadioReco.modules.trigger.simpleThreshold.triggerSimulator()

main_low_angle = np.deg2rad(-59.54968597864437)
phasing_angles = np.arcsin(np.linspace(np.sin(main_low_angle), -np.sin(main_low_angle), 11))


class mySimulation(simulation.simulation):
    def _detector_simulation_filter_amp(self, evt, station, det):
        channelBandPassFilter.run(evt, station, det,
                                  passband=[96 * units.MHz, 100 * units.GHz],
                                  filter_type="cheby1", order=4, rp=0.1)
        channelBandPassFilter.run(evt, station, det,
                                  passband=[0, 220 * units.MHz],
                                  filter_type="cheby1", order=7, rp=0.1)

    def _detector_simulation_trigger(self, evt, station, det):
        Vrms = self._Vrms_per_channel[station.get_id()][0]
        highLowTrigger.run(evt, station, det,
                           threshold_high=2 * Vrms,
                           threshold_low=-2 * Vrms,
                           triggered_channels=None,
                           number_concidences=1,
                           trigger_name="hilo_2sig")
        simpleTrigger.run(evt, station, det,
                          threshold=3 * Vrms,
                          triggered_channels=[0, 1],
                          number_concidences=1,
                          trigger_name="simple_3sig")
        cid = det.get_channel_ids(station.get_id())[0]
        sampling_rate = det.get_sampling_frequency(station.get_id(), cid)
        window = int(16 * units.ns * sampling_rate * 2.0)
        step = int(8 * units.ns * sampling_rate * 2.0)
        phasedArrayTrigger.run(evt, station, det,
                               Vrms=Vrms,
                               threshold=30.85 * np.power(Vrms, 2.0),
                               triggered_channels=range(0, 4),
                               phasing_angles=phasing_angles,
                               ref_index=1.75,
                               trigger_name="PA_4channel",
                               trigger_adc=False,
                               adc_output="voltage",
                               trigger_filter=None,
                               upsampling_factor=2,
                               window=window,
                               step=step)


here = os.path.dirname(os.path.abspath(__file__))
repo = os.path.dirname(os.path.dirname(here))
cfg_path = os.path.join(here, "_e2e_multitrigger_config.yaml")
with open(cfg_path, "w") as f:
    yaml.safe_dump({
        "noise": False,
        "sampling_rate": 2.0,
        "speedup": {"minimum_weight_cut": 1e-5, "delta_C_cut": 0.698,
                    "redo_raytracing": True, "distance_cut": False},
        "propagation": {"ice_model": "southpole_2015", "focusing": True},
        "signal": {"model": "Alvarez2009"},
        "trigger": {"noise_temperature": 300},
        "weights": {"weight_mode": "core_mantle_crust_simple"},
    }, f)

out_hdf5 = os.path.join(here, "_e2e_multitrigger_output.hdf5")
sim = mySimulation(
    inputfilename=os.path.join(here, "pa_noiseless_input.hdf5"),
    outputfilename=out_hdf5,
    detectorfile="/root/reference/NuRadioMC/test/Veff/single_pa_200m.json",
    config_file=cfg_path,
    file_overwrite=True)
sim.run()

import h5py
with h5py.File(out_hdf5) as f:
    group_ids = np.asarray(f["event_group_ids"])
    triggered = np.asarray(f["triggered"])
    weights = np.asarray(f["weights"])
    mt = np.asarray(f["multiple_triggers"])
    tt = np.asarray(f["trigger_times"])
    names = [n.decode() if isinstance(n, bytes) else str(n)
             for n in f.attrs["trigger_names"]]
    _, first = np.unique(group_ids, return_index=True)
    np.savez_compressed(
        os.path.join(here, "e2e_multitrigger_reference.npz"),
        group_ids=group_ids, triggered=triggered, weights=weights,
        multiple_triggers=mt, trigger_times=tt,
        trigger_names=np.array(names, dtype="S"),
        Vrms=sim._Vrms)
print("multi-trigger golden written")
print("trigger_names:", names)
for i, n in enumerate(names):
    per_group = np.zeros(len(first), dtype=bool)
    for j, g in enumerate(np.unique(group_ids)):
        per_group[j] = np.any(mt[group_ids == g, i])
    print(f"  {n}: {per_group.sum()} triggered groups")
