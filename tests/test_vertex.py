"""2D vertex reconstructor with on-the-fly ray-traced travel-time tables
(neutrinoVertexReconstructor/neutrino2DVertexReconstructor.py:16-500)."""
import jax
import numpy as np
import pytest

from nuradiomc_tpu.detector.detector import Detector
from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.event import Channel, Event, Station
from nuradiomc_tpu.models import ice as ice_models
from nuradiomc_tpu.ops import raytrace
from nuradiomc_tpu.reco.vertex import (
    build_travel_time_table, lookup_travel_time, neutrino2DVertexReconstructor)
from nuradiomc_tpu.utils import units

stnp = par.stationParameters
ICE = ice_models.greenland_simple if hasattr(ice_models, "greenland_simple") \
    else ice_models.get_ice_model("greenland_simple")

DEPTHS = [-60.0, -80.0, -100.0, -120.0]
TABLE_KW = dict(x_min=20.0, x_max=1500.0, d_x=4.0,
                z_min=-1200.0, z_max=-30.0, d_z=4.0)


def _det_string():
    chans = {}
    for cid, z in enumerate(DEPTHS):
        chans[str(cid + 1)] = {
            "adc_n_samples": 2048, "adc_sampling_frequency": 2.0,
            "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
            "ant_position_x": 0.0, "ant_position_y": 0.0, "ant_position_z": z,
            "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
            "ant_type": "analytic_VPol", "amp_type": "", "cab_time_delay": 0.0,
            "adc_nbits": None, "channel_id": cid, "station_id": 21,
        }
    return Detector({"channels": chans,
                     "stations": {"1": {"station_id": 21, "pos_altitude": 0,
                                        "pos_easting": 0, "pos_northing": 0}}})


@pytest.fixture(scope="module")
def table_60():
    return build_travel_time_table(ICE, -60.0, **TABLE_KW)


def test_table_matches_direct_solver(table_60):
    header, table = table_60
    # compare a handful of grid points against a direct solver call
    pts = [(100.0, -300.0), (500.0, -700.0), (50.0, -100.0)]
    for r, z in pts:
        sols = raytrace.find_solutions(0.0, min(z, -60.0), r, max(z, -60.0), ICE)
        tt_lookup = {rt: lookup_travel_time(header, table, rt, r, z)
                     for rt in ("direct", "refracted", "reflected")}
        for slot in range(2):
            if not bool(sols.mask[slot]):
                continue
            st = int(sols.sol_type[slot])
            rt = {1: "direct", 2: "refracted", 3: "reflected"}[st]
            # nearest-bin lookup: tolerance = travel time across two bins
            assert abs(float(sols.travel_time[slot]) - tt_lookup[rt]) < 40.0


def test_vertex_reconstruction(table_60):
    det = _det_string()
    ice = ICE
    r_true, z_true = 620.0, -480.0
    fs, n = 2.0, 2048
    t = np.arange(n) / fs

    # first-arrival travel time per channel from the analytic solver;
    # a common offset cancels in the pair time differences
    first_arrivals = []
    for depth in DEPTHS:
        sols = raytrace.find_solutions(0.0, z_true, r_true, depth, ice)
        first_arrivals.append(min(float(sols.travel_time[s]) for s in range(2)
                                  if bool(sols.mask[s])))
    t0 = min(first_arrivals) - 300.0
    st = Station(21)
    for cid, tt_c in enumerate(first_arrivals):
        t_arrival = tt_c - t0
        tr = 0.2 * np.exp(-0.5 * ((t - t_arrival) / 3.0) ** 2) \
            * np.sin(2 * np.pi * 0.25 * (t - t_arrival))
        rng = np.random.default_rng(cid)
        ch = Channel(cid)
        ch.set_trace(tr + rng.normal(0, 1e-3, n), fs)
        st.add_channel(ch)
    evt = Event(0, 0)
    evt.set_station(st)

    reco = neutrino2DVertexReconstructor(ice, table_kwargs=TABLE_KW)
    reco.begin(21, [0, 1, 2, 3], det, passband=None)
    r_rec, z_rec = reco.run(evt, st, max_distance=1400.0, z_width=1100.0,
                            grid_spacing=20.0)
    # pair timing constrains the vertex direction tightly and range loosely;
    # require the right region on the (rather coarse) 20 m grid
    assert abs(z_rec / r_rec - z_true / r_true) < 0.25
    assert abs(r_rec - r_true) < 250.0
    assert abs(z_rec - z_true) < 250.0
    assert st.has_parameter(stnp.vertex_2D_fit)


def test_vertex_3d_reconstruction(table_60):
    """3D search with channels on two strings
    (neutrino3DVertexReconstructor.py:15-999 semantics)."""
    from nuradiomc_tpu.reco.vertex import neutrino3DVertexReconstructor

    # two strings offset in both x and y (a coplanar array cannot resolve
    # the mirror image across its plane)
    chans = {}
    positions = [(0.0, 0.0, -60.0), (0.0, 0.0, -100.0),
                 (40.0, 30.0, -80.0), (40.0, 30.0, -120.0)]
    for cid, (x, y, z) in enumerate(positions):
        chans[str(cid + 1)] = {
            "adc_n_samples": 2048, "adc_sampling_frequency": 2.0,
            "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
            "ant_position_x": x, "ant_position_y": y, "ant_position_z": z,
            "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
            "ant_type": "analytic_VPol", "amp_type": "", "cab_time_delay": 0.0,
            "adc_nbits": None, "channel_id": cid, "station_id": 22,
        }
    det = Detector({"channels": chans,
                    "stations": {"1": {"station_id": 22, "pos_altitude": 0,
                                       "pos_easting": 0, "pos_northing": 0}}})

    vx, vy, vz = 380.0, 290.0, -620.0
    fs, n = 2.0, 2048
    t = np.arange(n) / fs
    arrivals = []
    for (px, py, pz) in positions:
        d_hor = np.hypot(vx - px, vy - py)
        sols = raytrace.find_solutions(0.0, vz, d_hor, pz, ICE)
        arrivals.append(min(float(sols.travel_time[s]) for s in range(2)
                            if bool(sols.mask[s])))
    t0 = min(arrivals) - 300.0
    st = Station(22)
    for cid, tt_c in enumerate(arrivals):
        t_arr = tt_c - t0
        tr = 0.2 * np.exp(-0.5 * ((t - t_arr) / 3.0) ** 2) \
            * np.sin(2 * np.pi * 0.25 * (t - t_arr))
        rng = np.random.default_rng(10 + cid)
        ch = Channel(cid)
        ch.set_trace(tr + rng.normal(0, 1e-3, n), fs)
        st.add_channel(ch)
    evt = Event(0, 0)
    evt.set_station(st)

    reco = neutrino3DVertexReconstructor(ICE, table_kwargs=TABLE_KW)
    reco.begin(22, [0, 1, 2, 3], det)
    vertex = reco.run(evt, st, max_distance=1200.0,
                      z_range=(-1100.0, -50.0), coarse_steps=20, n_zoom=3)
    r_rec = np.hypot(vertex[0], vertex[1])
    r_true = np.hypot(vx, vy)
    # pair timing constrains direction well; range more loosely
    assert abs(np.arctan2(vertex[1], vertex[0])
               - np.arctan2(vy, vx)) < np.deg2rad(15)
    assert abs(vertex[2] / r_rec - vz / r_true) < 0.3
    assert abs(r_rec - r_true) < 300.0
    assert st.has_parameter(stnp.nu_vertex)
