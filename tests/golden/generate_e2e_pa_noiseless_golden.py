"""NOISELESS phased-array e2e golden: same chain as generate_e2e_pa_golden.py
but with noise off AND the Alvarez2009 k_L realizations pinned through the
input file (tests/golden/pa_noiseless_input.hdf5 = the committed 3000-event
input + a shower_realization_Alvarez2009 column of deterministic mean k_L;
both frameworks reuse input realizations, simulation.py:737-740), so the
beamforming/ADC/upsampling chain is pinned DETERMINISTICALLY (exact
triggered set, no Poisson band and no RNG coupling).

Run:  PYTHONPATH=/tmp/refstubs:/root/reference python tests/golden/generate_e2e_pa_noiseless_golden.py
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
from NuRadioReco.utilities import units
from NuRadioMC.simulation import simulation

channelBandPassFilter = NuRadioReco.modules.channelBandPassFilter.channelBandPassFilter()
phasedArrayTrigger = NuRadioReco.modules.phasedarray.phasedArrayTrigger.PhasedArrayTrigger()

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
                               trigger_name="PA_4channel_100Hz",
                               trigger_adc=False,
                               adc_output="voltage",
                               trigger_filter=None,
                               upsampling_factor=2,
                               window=window,
                               step=step)


here = os.path.dirname(os.path.abspath(__file__))
repo = os.path.dirname(os.path.dirname(here))
cfg_path = os.path.join(here, "_e2e_pa_noiseless_config.yaml")
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

out_hdf5 = os.path.join(here, "_e2e_pa_noiseless_output.hdf5")
# pinned-k_L input (regenerate with the snippet below if missing)
pinned_input = os.path.join(here, "pa_noiseless_input.hdf5")
if not os.path.exists(pinned_input):
    import shutil
    import h5py
    import sys
    sys.path.insert(0, repo)
    from nuradiomc_tpu.ops import askaryan as _ask
    shutil.copy(os.path.join(repo, "tests/data/1e18_n3000.hdf5"), pinned_input)
    with h5py.File(pinned_input, "a") as f:
        E = np.asarray(f["shower_energies"])
        st = np.array([x.decode() if isinstance(x, bytes) else x
                       for x in f["shower_type"]])
        log10_bar, _ = _ask.em_k_L_params_alvarez2009(np.maximum(E, 1.0))
        f["shower_realization_Alvarez2009"] = np.where(
            st == "em", 10.0 ** log10_bar,
            _ask.had_k_L_alvarez2009(np.maximum(E, 1.0)))

sim = mySimulation(
    inputfilename=pinned_input,
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
    vol = float(f.attrs["volume"])
    n_events = int(f.attrs["n_events"])
    _, first = np.unique(group_ids, return_index=True)
    veff = vol * float(np.sum(weights[first][triggered[first]])) / n_events
    np.savez_compressed(
        os.path.join(here, "e2e_pa_noiseless_reference.npz"),
        group_ids=group_ids, triggered=triggered, weights=weights,
        trigger_times=np.asarray(f["trigger_times"]) if "trigger_times" in f
        else np.zeros(0),
        Vrms=sim._Vrms, veff=veff, n_triggered=int(triggered[first].sum()))
print("PA golden written; n_triggered groups =", int(triggered[first].sum()),
      "Veff*4pi =", veff / units.km ** 3 * 4 * np.pi, "km^3 sr")
