"""PRODUCTION-SCALE golden: the reference's own Veff CI campaign, run once
in-container with the analytic_VPol antenna substitution (no XFDTD/RNOG
pickle exists anywhere under /root/reference, verified — the committed CI
anchors 5.35558 / 8.23497 km^3 sr in test/Veff/1e18eV/T03check_output.py:21-24
are therefore unreachable bit-exact here; this golden is the in-container
analogue with the identical workflow).

Two variants (argv[1]):

  dipole  (default)  test/Veff/1e18eV/T01generate_event_list.py:20-23 —
                     5e4 events, 1e18 eV, r<4 km, z in (-2.7 km, 0), seed 10;
                     T02RunSimulation with ../dipole_100m.json + ../config.yaml
                     (the reference's OWN config file, passed verbatim),
                     highlow_2sigma trigger. Noiseless => deterministic.
  pa                 T01generate_event_list_noise.py (1e4 events, r<3 km,
                     z in (-2 km, 0), seed 10) + D05phased_array_deep.py with
                     ../single_pa_200m.json + ../config_noise.yaml.
                     Noisy => conformance target is Veff within MC statistics.

Run:  PYTHONPATH=/tmp/refstubs:/root/reference python tests/golden/generate_veff_fullscale_golden.py [dipole|pa]
"""
import hashlib
import os
import sys

import numpy as np

from NuRadioReco.detector import antennapattern

_orig_init = antennapattern.AntennaPatternProvider.__init__

def _patched_init(self, *args, **kwargs):
    _orig_init(self, *args, **kwargs)
    self._antenna_model_replacements = {
        "XFDTD_Vpol_CrossFeed_150mmHole_n1.78": "analytic_VPol",
        "RNOG_vpol_v1_n1.73": "analytic_VPol"}

antennapattern.AntennaPatternProvider.__init__ = _patched_init

import NuRadioReco.modules.channelBandPassFilter
import NuRadioReco.modules.phasedarray.phasedArrayTrigger
import NuRadioReco.modules.trigger.highLowThreshold
from NuRadioMC.EvtGen.generator import generate_eventlist_cylinder
from NuRadioMC.simulation import simulation
from NuRadioReco.utilities import units

variant = sys.argv[1] if len(sys.argv) > 1 else "dipole"
here = os.path.dirname(os.path.abspath(__file__))
refveff = "/root/reference/NuRadioMC/test/Veff"

channelBandPassFilter = NuRadioReco.modules.channelBandPassFilter.channelBandPassFilter()


def input_sha1(path):
    """Stable digest of the generated event list's physics content, so the
    consuming test can prove its own (seed-exact) evtgen reproduced the
    identical input without committing the multi-MB file."""
    import h5py

    h = hashlib.sha1()
    with h5py.File(path) as f:
        for k in sorted(f.keys()):
            arr = np.asarray(f[k])
            if arr.dtype.kind in "OU":   # vlen/unicode strings: canonical
                arr = arr.astype("S")    # fixed-width bytes
            arr = np.ascontiguousarray(arr)
            h.update(k.encode())
            h.update(arr.tobytes())
    return h.hexdigest()


# The CI default ccnc model (hedis_bgr18) requires a table download that is
# impossible in-container; ctw is used on BOTH sides (same deviation as the
# committed 3000-event input, tests/test_evtgen.py:160). All other
# parameters are verbatim.
CCNC_MODEL = "ctw"

if variant == "dipole":
    # T01generate_event_list.py:10-23, verbatim parameters
    infile = os.path.join(here, "_veff_fullscale_input.hdf5")
    if not os.path.exists(infile):
        generate_eventlist_cylinder(
            infile, 5e4, 1e18 * units.eV, 1e18 * units.eV,
            {"fiducial_rmin": 0 * units.km, "fiducial_rmax": 4 * units.km,
             "fiducial_zmin": -2.7 * units.km, "fiducial_zmax": 0 * units.km},
            seed=10, cross_sections_model=CCNC_MODEL)

    triggerSimulatorHighLow = \
        NuRadioReco.modules.trigger.highLowThreshold.triggerSimulator()

    class mySimulation(simulation.simulation):
        # T02RunSimulation.py:24-38
        def _detector_simulation_filter_amp(self, evt, station, det):
            channelBandPassFilter.run(
                evt, station, det,
                passband=[80 * units.MHz, 1000 * units.GHz],
                filter_type="butter", order=2)
            channelBandPassFilter.run(
                evt, station, det, passband=[0, 500 * units.MHz],
                filter_type="butter", order=10)

        def _detector_simulation_trigger(self, evt, station, det):
            triggerSimulatorHighLow.run(
                evt, station, det,
                threshold_high=2 * self._Vrms,
                threshold_low=-2 * self._Vrms,
                triggered_channels=None, number_concidences=1,
                trigger_name="highlow_2sigma")

    out_hdf5 = os.path.join(here, "_veff_fullscale_output.hdf5")
    sim = mySimulation(
        inputfilename=infile, outputfilename=out_hdf5,
        detectorfile=os.path.join(refveff, "dipole_100m.json"),
        config_file=os.path.join(refveff, "config.yaml"),
        file_overwrite=True)
    sim.run()
    out_npz = os.path.join(here, "veff_fullscale_reference.npz")
    extra = {"Vrms": sim._Vrms, "bandwidth": sim._bandwidth}
else:
    # T01generate_event_list_noise.py + D05phased_array_deep.py
    infile = os.path.join(here, "_veff_fullscale_pa_input.hdf5")
    if not os.path.exists(infile):
        generate_eventlist_cylinder(
            infile, 1e4, 1e18 * units.eV, 1e18 * units.eV,
            {"fiducial_rmin": 0 * units.km, "fiducial_rmax": 3 * units.km,
             "fiducial_zmin": -2 * units.km, "fiducial_zmax": 0 * units.km},
            seed=10, cross_sections_model=CCNC_MODEL)

    phasedArrayTrigger = \
        NuRadioReco.modules.phasedarray.phasedArrayTrigger.PhasedArrayTrigger()
    main_low_angle = np.deg2rad(-59.54968597864437)
    phasing_angles = np.arcsin(
        np.linspace(np.sin(main_low_angle), -np.sin(main_low_angle), 11))

    class mySimulation(simulation.simulation):
        # D05phased_array_deep.py:53-84 (4-channel branch)
        def _detector_simulation_filter_amp(self, evt, station, det):
            channelBandPassFilter.run(
                evt, station, det,
                passband=[96 * units.MHz, 100 * units.GHz],
                filter_type="cheby1", order=4, rp=0.1)
            channelBandPassFilter.run(
                evt, station, det, passband=[0, 220 * units.MHz],
                filter_type="cheby1", order=7, rp=0.1)

        def _detector_simulation_trigger(self, evt, station, det):
            Vrms = self._Vrms_per_channel[station.get_id()][0]
            cid = det.get_channel_ids(station.get_id())[0]
            sampling_rate = det.get_sampling_frequency(station.get_id(), cid)
            window = int(16 * units.ns * sampling_rate * 2.0)
            step = int(8 * units.ns * sampling_rate * 2.0)
            phasedArrayTrigger.run(
                evt, station, det, Vrms=Vrms,
                threshold=30.85 * np.power(Vrms, 2.0),
                triggered_channels=range(0, 4),
                phasing_angles=phasing_angles, ref_index=1.75,
                trigger_name="PA_4channel_100Hz", trigger_adc=False,
                adc_output="voltage", trigger_filter=None,
                upsampling_factor=2, window=window, step=step)

    out_hdf5 = os.path.join(here, "_veff_fullscale_pa_output.hdf5")
    sim = mySimulation(
        inputfilename=infile, outputfilename=out_hdf5,
        detectorfile=os.path.join(refveff, "single_pa_200m.json"),
        config_file=os.path.join(refveff, "config_noise.yaml"),
        default_detector_station=1, file_overwrite=True)
    sim.run()
    out_npz = os.path.join(here, "veff_fullscale_pa_reference.npz")
    extra = {"Vrms": sim._Vrms}

import h5py

with h5py.File(out_hdf5) as f:
    group_ids = np.asarray(f["event_group_ids"])
    triggered = np.asarray(f["triggered"])
    weights = np.asarray(f["weights"])
    vol = float(f.attrs["volume"])
    n_events = int(f.attrs["n_events"])
    # T03check_output.py:36-44: sum of per-group weights of triggered groups
    _, first = np.unique(group_ids, return_index=True)
    n_trig_w = float(np.sum(weights[first][triggered[first]]))
    veff = vol * 4 * np.pi * n_trig_w / n_events

np.savez_compressed(
    out_npz,
    group_ids=group_ids, triggered=triggered, weights=weights,
    veff=veff, volume=vol, n_events=n_events,
    n_triggered=int(triggered[first].sum()),
    input_sha1=np.bytes_(input_sha1(infile)), **extra)
print(f"full-scale {variant} golden: n_triggered groups = "
      f"{int(triggered[first].sum())}  Veff*4pi = "
      f"{veff / units.km ** 3:.6g} km^3 sr  -> {out_npz}")
