"""End-to-end in-ice reconstruction chain on a synthetic event:

1. reconstruct the vertex from channel-pair timing (3D correlation stack)
2. reconstruct the neutrino direction + shower energy by forward folding

Run:  python run_reco_chain.py   (CPU-friendly, ~1 min)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from nuradiomc_tpu.detector.detector import Detector
from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.event import Channel, Event, Station
from nuradiomc_tpu.models import ice as ice_models
from nuradiomc_tpu.ops import raytrace
from nuradiomc_tpu.reco.nu_direction import neutrinoDirectionReconstructor
from nuradiomc_tpu.reco.vertex import neutrino3DVertexReconstructor

stnp = par.stationParameters
ICE = ice_models.get_ice_model("greenland_simple")

# three strings, eight channels: enough pairs to break correlation ghosts
# from the two-pulse (direct + refracted) waveforms
positions = [(0.0, 0.0, -60.0), (0.0, 0.0, -80.0), (0.0, 0.0, -100.0),
             (40.0, 30.0, -60.0), (40.0, 30.0, -90.0), (40.0, 30.0, -120.0),
             (-30.0, 40.0, -70.0), (-30.0, 40.0, -110.0)]
chans = {str(c + 1): {
    "adc_n_samples": 1024, "adc_sampling_frequency": 2.0,
    "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
    "ant_position_x": x, "ant_position_y": y, "ant_position_z": z,
    "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
    "ant_type": "analytic_VPol", "amp_type": "", "cab_time_delay": 0.0,
    "adc_nbits": None, "channel_id": c, "station_id": 1}
    for c, (x, y, z) in enumerate(positions)}
det = Detector({"channels": chans,
                "stations": {"1": {"station_id": 1, "pos_altitude": 0,
                                   "pos_easting": 0, "pos_northing": 0}}})

# ---- synthesize an event with the direction reconstructor's forward model
vertex_true = np.array([380.0, 240.0, -600.0])
zen_true, az_true, logE_true = np.deg2rad(120.0), np.deg2rad(35.0), 17.5

dir_reco = neutrinoDirectionReconstructor()
dir_reco.begin(ICE, attenuation_model="GL1")
st = Station(1)
for cid in range(len(positions)):
    ch = Channel(cid)
    ch.set_trace(np.zeros(1024), 2.0)
    st.add_channel(ch)
evt = Event(0, 0)
evt.set_station(st)
dir_reco.run(evt, st, det, vertex=vertex_true,
             use_channels=list(range(len(positions))),
             zenith_range=(zen_true - .01, zen_true + .01),
             azimuth_range=(az_true - .01, az_true + .01),
             energy_range=(logE_true - .01, logE_true + .01),
             coarse_steps=(2, 2, 2), n_zoom=0)
traces = np.asarray(dir_reco.forward(zen_true, az_true, logE_true))
rng = np.random.default_rng(0)
noise = 0.03 * np.max(np.abs(traces))
for cid in range(len(positions)):
    st.get_channel(cid).set_trace(traces[cid] + rng.normal(0, noise, 1024), 2.0)

# ---- step 1: vertex
tab_kw = dict(x_min=20.0, x_max=1200.0, d_x=5.0,
              z_min=-1100.0, z_max=-30.0, d_z=5.0)
v_reco = neutrino3DVertexReconstructor(ICE, table_kwargs=tab_kw)
v_reco.begin(1, list(range(len(positions))), det)
vertex = v_reco.run(evt, st, max_distance=1000.0, z_range=(-1000.0, -50.0),
                    coarse_steps=18, n_zoom=3)
print(f"vertex: true {vertex_true}, reco {np.round(vertex, 1)}")

# ---- step 2: direction + energy (using the reconstructed vertex)
zen, az, logE = dir_reco.run(
    evt, st, det, vertex=np.asarray(vertex), noise_RMS=noise,
    use_channels=list(range(len(positions))),
    zenith_range=(zen_true - np.deg2rad(10), zen_true + np.deg2rad(10)),
    azimuth_range=(az_true - np.deg2rad(10), az_true + np.deg2rad(10)),
    energy_range=(logE_true - 1, logE_true + 1),
    coarse_steps=(9, 9, 9), n_zoom=2)
print(f"direction: true ({np.rad2deg(zen_true):.1f}, {np.rad2deg(az_true):.1f}) deg, "
      f"reco ({np.rad2deg(zen):.1f}, {np.rad2deg(az):.1f}) deg")
print(f"log10 shower energy: true {logE_true:.2f}, reco {logE:.2f}")
