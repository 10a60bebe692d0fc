#!/usr/bin/env python3
"""RNO-G station simulation: deep phased-array Veff + FLOWER trigger board
+ surface trigger + data-cleaning chain.

Mirrors the reference examples 07_RNO_G_simulation and
RNO_G_trigger_simulation/simulate.py:

1. A deep 4-channel VPol phased array (100 m) simulated end-to-end with
   noise, trigger-ADC digitization and upsampling (PA trigger at the
   ~100 Hz noise working point).
2. The FLOWER-board response on the trigger channels: noise-bit gain
   equalization + 8-bit ADC (RNO_G/triggerBoardResponse.py semantics).
3. The RNO-G surface trigger (Schottky-diode envelope, rnog_surface_trigger)
   on upward LPDAs.
4. The data-side cleaning chain on the digitized traces: block-offset
   removal, glitch detection, hit filter.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
import jax.numpy as jnp

from nuradiomc_tpu.detector.detector import Detector
from nuradiomc_tpu.framework.event import Channel, Event, Station
from nuradiomc_tpu.reco.rnog import rnogSurfaceTrigger, triggerBoardResponse
from nuradiomc_tpu.reco.rnog_data import (channelBlockOffsets,
                                          channelGlitchDetector,
                                          stationHitFilter)
from nuradiomc_tpu.sim import evtgen
from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
from nuradiomc_tpu.utils import units

HERE = os.path.dirname(os.path.abspath(__file__))
N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 1000

# ---------------------------------------------------------------------------
# 1. deep phased-array Veff (RNO-G power string: 4 VPols at ~100 m)
# ---------------------------------------------------------------------------
detector_dict = {
    "channels": {str(i + 1): {
        "adc_n_samples": 256, "adc_sampling_frequency": 0.472, "adc_nbits": 8,
        "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
        "ant_position_x": 0.0, "ant_position_y": 0.0,
        "ant_position_z": -97.0 - i,
        "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
        "ant_type": "analytic_VPol", "amp_type": "", "cab_time_delay": 45.0,
        "channel_id": i, "station_id": 11,
        "trigger_adc_noise_count": 2, "trigger_adc_nbits": 8,
        "trigger_adc_max_voltage": 1.0 * units.volt,
        "trigger_adc_min_voltage": -1.0 * units.volt,
    } for i in range(4)},
    "stations": {"1": {"station_id": 11, "pos_altitude": 0, "pos_easting": 0,
                       "pos_northing": 0, "pos_site": "summit"}},
}

infile = os.path.join(HERE, "rnog_events.hdf5")
evtgen.generate_eventlist_cylinder(
    infile, N_EVENTS, 1e18, 1e18,
    {"fiducial_rmin": 0, "fiducial_rmax": 2 * units.km,
     "fiducial_zmin": -2.5 * units.km, "fiducial_zmax": 0}, seed=42)

sim = Simulation(
    infile, detector_dict,
    config={"sampling_rate": 2.0, "noise": True,
            "propagation": {"ice_model": "greenland_simple",
                            "attenuation_model": "GL1", "focusing": True},
            "signal": {"model": "Alvarez2009"},
            "weights": {"weight_mode": "core_mantle_crust_simple"}},
    filter_chain=[
        FilterStage((96 * units.MHz, 100 * units.GHz), "cheby1",
                    {"order": 4, "rp": 0.1}),
        FilterStage((0, 220 * units.MHz), "cheby1", {"order": 7, "rp": 0.1}),
    ],
    trigger=TriggerSpec(trigger_type="phased_array",
                        pa_threshold_factor=30.85),
    dtype=jnp.float32, chunk_size=256)
results = sim.run()
print(f"deep PA: {results['n_triggered']}/{N_EVENTS} triggered, "
      f"Veff = {results['veff'] / units.km ** 3:.4f} km^3")

# ---------------------------------------------------------------------------
# 2+3+4. FLOWER board + surface trigger + cleaning on one readout event
# ---------------------------------------------------------------------------
det = Detector(detector_dict)
rng = np.random.default_rng(7)
fs, n = 0.472, 2048

evt = Event(0, 1)
st = Station(11)
for cid in range(4):
    # impulsive signal on top of thermal noise, 128-sample block offsets
    tr = rng.normal(0.0, 1.0e-3, n)
    t0 = 900 + 40 * cid
    tt = np.arange(n) / fs
    tr += 12e-3 * np.exp(-0.5 * ((tt - tt[t0]) / 8.0) ** 2) \
        * np.cos(2 * np.pi * 0.15 * (tt - tt[t0]))
    tr += np.repeat(rng.normal(0, 0.5e-3, n // 128), 128)  # block pedestals
    ch = Channel(cid)
    ch.set_trace(tr, fs)
    st.add_channel(ch)
evt.set_station(st)

board = triggerBoardResponse()
board.begin(adc_output="voltage")
surf_det = Detector({
    "channels": {str(c + 1): {**detector_dict["channels"]["1"],
                              "channel_id": c, "ant_position_z": -2.0,
                              "ant_orientation_theta": 180.0,
                              "ant_type": "analytic_LPDA"}
                 for c in range(4)},
    "stations": detector_dict["stations"]})
eq_vrms = board.run(evt, st, surf_det, trigger_channels=[0, 1, 2, 3])
print(f"FLOWER board: equalized Vrms = {np.round(eq_vrms * 1e3, 3)} mV "
      f"(8-bit ADC applied)")

surface = rnogSurfaceTrigger()
surface.begin()
surface.run(evt, st, surf_det, threshold=5 * units.mV,
            triggered_channels=[0, 1, 2, 3], number_coincidences=2)
fired = st.get_trigger("rnog_surface_trigger").has_triggered()
print(f"surface trigger fired: {fired}")

offsets = channelBlockOffsets()
offsets.begin()
offsets.run(evt, st)
glitch = channelGlitchDetector()
glitch.begin()
glitch.run(evt, st)
hits = stationHitFilter()
hits.begin()
passed = hits.run(evt, st)
print(f"cleaning chain: block offsets removed, glitch scan done, "
      f"hit filter -> {bool(passed)}")
