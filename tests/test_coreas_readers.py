"""CoREAS reader-module family, ARA interop, dump/plot utilities.

Covers readCoREASStation/readCoREASShower/readCoREASDetector/
simulationSelector (reference NuRadioReco/modules/io/coreas/*),
calculateAmplitudePerRaySolution (modules/custom/deltaT),
templateDirectionFitter, readARAEventList/NuRadioMCtoAraSim (EvtGen), and
utilities dump_hdf5/plotting — all on synthetic fixtures.
"""

import io

import h5py
import numpy as np
import pytest

from nuradiomc_tpu.detector.detector import Detector
from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.event import Channel, Event, Station
from nuradiomc_tpu.reco import coreas_readers
from nuradiomc_tpu.sim import io_ascii, io_coreas
from nuradiomc_tpu.utils import units

efp = par.electricFieldParameters
shp = par.showerParameters
stnp = par.stationParameters
chp = par.channelParameters


@pytest.fixture
def corsika_file(tmp_path):
    """Synthetic CORSIKA-7/CoREAS star-shape file incl. CoREAS attrs."""
    path = str(tmp_path / "coreas.hdf5")
    with h5py.File(path, "w") as f:
        inputs = f.create_group("inputs")
        inputs.attrs["THETAP"] = np.array([35.0, 35.0])
        inputs.attrs["PHIP"] = np.array([120.0, 120.0])
        inputs.attrs["MAGNET"] = np.array([18.5, 48.3])
        inputs.attrs["ERANGE"] = np.array([1e8, 1e8])
        inputs.attrs["RUNNR"] = 1
        inputs.attrs["EVTNR"] = 7
        inputs.attrs["PRMPAR"] = 14
        inputs.attrs["OBSLEV"] = 280000.0  # cm
        coreas_grp = f.create_group("CoREAS")
        coreas_grp.attrs["CoreCoordinateWest"] = 0.0
        coreas_grp.attrs["CoreCoordinateNorth"] = 0.0
        coreas_grp.attrs["CoreCoordinateVertical"] = 280000.0
        coreas_grp.attrs["DepthOfShowerMaximum"] = 650.0
        coreas_grp.attrs["DistanceOfShowerMaximum"] = 500000.0
        coreas_grp.attrs["GroundLevelRefractiveIndex"] = 1.000292
        coreas_grp.attrs["RotationAngleForMagfieldDeclination"] = 0.0
        obs = coreas_grp.create_group("observers")
        t = np.arange(256) * 2e-10
        for i, (r, phi) in enumerate([(rr, pp) for rr in (2000, 8000, 20000)
                                      for pp in np.linspace(0, 2 * np.pi, 8,
                                                            endpoint=False)]):
            data = np.zeros((256, 4))
            data[:, 0] = t
            amp = 1e-3 / (1 + (r / 10000) ** 2)
            pulse = amp * np.exp(-0.5 * ((np.arange(256) - 100) / 8.0) ** 2)
            data[:, 1] = pulse
            data[:, 2] = 0.3 * pulse
            data[:, 3] = 0.1 * pulse
            d = obs.create_dataset(f"obs_{i}", data=data)
            d.attrs["position"] = np.array([r * np.cos(phi),
                                            r * np.sin(phi), 0.0])
    return path


def _det_dict(station_id=7, n=4):
    chans = {}
    pos = [(3, 0), (0, 3), (-3, 0), (0, -3)][:n]
    for cid, (x, y) in enumerate(pos):
        chans[str(cid + 1)] = {
            "adc_n_samples": 512, "adc_sampling_frequency": 1.0,
            "ant_orientation_phi": 0.0, "ant_orientation_theta": 180.0,
            "ant_position_x": x, "ant_position_y": y, "ant_position_z": -1.0,
            "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
            "ant_type": "analytic_LPDA", "amp_type": "", "cab_time_delay": 0.0,
            "adc_nbits": None, "channel_id": cid, "station_id": station_id,
        }
    return {"channels": chans,
            "stations": {"1": {"station_id": station_id, "pos_altitude": 0,
                               "pos_easting": 0, "pos_northing": 0,
                               "pos_site": "summit"}}}


def test_simulation_weights_star_pattern(corsika_file):
    evt = io_coreas.read_CORSIKA7(corsika_file)
    shower = evt.get_first_sim_shower()
    efields = evt.get_station(0).get_sim_station().get_electric_fields()
    pos = np.array([ef.get_position() for ef in efields])
    w = io_coreas.calculate_simulation_weights(
        pos, shower[shp.zenith], shower[shp.azimuth], site="summit")
    assert w.shape == (24,)
    # the outermost ring (8 arm tips) carries zero weight
    r = np.hypot(pos[:, 0], pos[:, 1])
    outer = r > 150.0
    assert np.all(w[outer] == 0.0)
    # middle-ring cells have positive area and are ~equal by symmetry
    mid = (r > 50) & (r < 150)
    assert np.all(w[mid] > 0)
    assert np.ptp(w[mid]) / np.mean(w[mid]) < 0.2


def test_read_corsika7_extended_attrs(corsika_file):
    evt = io_coreas.read_CORSIKA7(corsika_file)
    shower = evt.get_first_sim_shower()
    np.testing.assert_allclose(
        shower[shp.observation_level], 280000.0 * units.cm)
    np.testing.assert_allclose(
        shower[shp.shower_maximum], 650.0 * units.g / units.cm2)
    np.testing.assert_allclose(shower[shp.core][2], 280000.0 * units.cm)
    assert shower[shp.primary_particle] == 14


def test_read_coreas_station(corsika_file):
    det = Detector(_det_dict())
    reader = coreas_readers.readCoREASStation()
    reader.begin([corsika_file], station_id=7)
    events = list(reader.run(det))
    assert len(events) == 24
    evt = events[0]
    st = evt.get_station(7)
    sim = st.get_sim_station()
    assert sim.is_cosmic_ray()
    efs = sim.get_electric_fields()
    assert len(efs) == 1
    tr = np.asarray(efs[0].get_trace())
    # zeros prepended: first half of the trace is exactly zero
    assert tr.shape[1] == 512
    assert np.all(tr[:, :200] == 0)
    # core shifted so the observer lands on the station (at the origin):
    # new core = file core (0, 0, zlev) + (station - observer)
    shower = evt.get_first_sim_shower()
    core = shower[shp.core]
    obs_pos = io_coreas.read_CORSIKA7(corsika_file).get_station(0) \
        .get_sim_station().get_electric_fields()[0].get_position()
    np.testing.assert_allclose(core[:2], -obs_pos[:2], atol=1e-6)
    # weights attached
    assert sim.get_simulation_weight() is not None


def test_read_coreas_shower_no_det(corsika_file):
    reader = coreas_readers.readCoREASShower()
    reader.begin([corsika_file])
    events = list(reader.run())
    assert len(events) == 1
    evt = events[0]
    assert len(evt.get_station_ids()) == 24
    st0 = evt.get_station(0)
    assert st0.get_sim_station()[stnp.cr_energy] == pytest.approx(1e8 * units.GeV)


def test_read_coreas_shower_with_generic_detector(corsika_file):
    det = Detector(_det_dict(station_id=0), default_station=0)
    reader = coreas_readers.readCoREASShower()
    reader.begin([corsika_file], det=det)
    evt, det_out = next(iter(reader.run()))
    # stations 1..23 were added on the fly from the reference station
    assert det_out.has_station(5)
    assert list(det_out.get_channel_ids(5)) == list(det_out.get_channel_ids(0))
    # their positions match the observer positions
    ef5 = io_coreas.read_CORSIKA7(corsika_file).get_station(0) \
        .get_sim_station().get_electric_fields()[5]
    np.testing.assert_allclose(det_out.get_absolute_position(5),
                               ef5.get_position(), atol=1e-9)


def test_read_coreas_detector(corsika_file):
    det = Detector(_det_dict())
    reader = coreas_readers.readCoREASDetector()
    reader.begin(corsika_file)
    cores = [[0.0, 0.0], [30.0, 10.0]]
    events = list(reader.run(det, cores))
    assert len(events) == 2
    for iCore, evt in enumerate(events):
        shower = evt.get_first_sim_shower()
        np.testing.assert_allclose(shower[shp.core][:2], cores[iCore])
        sim = evt.get_station(7).get_sim_station()
        efs = sim.get_electric_fields()
        assert len(efs) >= 1
        assert sim.is_cosmic_ray()
        for ef in efs:
            tr = np.asarray(ef.get_trace())
            assert tr.shape[0] == 3 and np.all(np.isfinite(tr))


def test_random_core_positions_deterministic():
    a = coreas_readers.get_random_core_positions(-100, 100, -50, 50, 10, seed=3)
    b = coreas_readers.get_random_core_positions(-100, 100, -50, 50, 10, seed=3)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (10, 2)
    assert np.all(a[:, 0] >= -100) and np.all(a[:, 0] <= 100)
    assert np.all(a[:, 1] >= -50) and np.all(a[:, 1] <= 50)


def test_simulation_selector(corsika_file):
    evt = io_coreas.read_CORSIKA7(corsika_file)
    sim_station = evt.get_station(0).get_sim_station()
    sel = coreas_readers.simulationSelector()
    sel.begin()
    # the synthetic pulse is broadband -> in-band signal present
    assert sel.run(evt, sim_station, None) is True
    sel.end()


def test_calculate_amplitude_per_ray_solution(corsika_file):
    from nuradiomc_tpu.reco.custom_deltaT import calculateAmplitudePerRaySolution

    det = Detector(_det_dict())
    evt = io_coreas.read_CORSIKA7(corsika_file)
    # move the sim station onto detector station 7 with per-channel efields
    src = evt.get_station(0).get_sim_station()
    station = Station(7)
    sim = io_coreas.create_sim_station(7, evt)
    ef0 = src.get_electric_fields()[0]
    io_coreas.add_electric_field_to_sim_station(
        sim, [0, 1], np.asarray(ef0.get_trace()), 0.0,
        60 * units.deg, 30 * units.deg, ef0.get_sampling_rate())
    station.set_sim_station(sim)
    evt2 = Event(0, 0)
    evt2.set_station(station)

    mod = calculateAmplitudePerRaySolution()
    mod.begin()
    mod.run(evt2, station, det)
    ef = sim.get_electric_fields()[0]
    amps = ef[efp.max_amp_antenna]
    envs = ef[efp.max_amp_antenna_envelope]
    assert set(amps) == {0, 1}
    for cid in (0, 1):
        assert envs[cid] >= amps[cid] > 0


def test_template_direction_fitter():
    from nuradiomc_tpu.reco.advanced import channelTemplateCorrelation
    from nuradiomc_tpu.reco.direction import (get_time_delay_from_direction,
                                              templateDirectionFitter)

    det = Detector(_det_dict())
    zen_true, az_true = np.deg2rad(55.0), np.deg2rad(127.0)
    fs = 5.0
    n = 512
    tpl = np.exp(-0.5 * ((np.arange(120) - 60) / 6.0) ** 2) * \
        np.sin(2 * np.pi * 0.3 * np.arange(120) / fs)

    station = Station(7)
    for cid in range(4):
        pos = det.get_relative_position(7, cid)
        delay = get_time_delay_from_direction(zen_true, az_true, pos)
        shift = int(round(delay * fs))
        trace = np.zeros(n)
        start = 200 + shift
        trace[start:start + len(tpl)] = tpl
        ch = Channel(cid)
        ch.set_trace(trace, fs)
        ch.set_trace_start_time(0.0)
        station.add_channel(ch)
    evt = Event(0, 0)
    evt.set_station(station)

    corr = channelTemplateCorrelation()
    corr.begin({"default": tpl})
    corr.run(evt, station, det, cosmic_ray=True)
    fitter = templateDirectionFitter()
    fitter.begin()
    fitter.run(evt, station, det, channels_to_use=[0, 1, 2, 3], cosmic_ray=True)

    assert station[stnp.zenith] == pytest.approx(zen_true, abs=np.deg2rad(5))
    assert station[stnp.azimuth] == pytest.approx(az_true, abs=np.deg2rad(5))
    assert station[stnp.cr_zenith] == station[stnp.zenith]


def test_ara_eventlist_roundtrip(tmp_path):
    hdf5_in = str(tmp_path / "in.hdf5")
    ara_out = str(tmp_path / "out.txt")
    n = 5
    rng = np.random.default_rng(1)
    zeniths = rng.uniform(0.1, np.pi - 0.1, n)
    azimuths = rng.uniform(0, 2 * np.pi, n)
    with h5py.File(hdf5_in, "w") as f:
        f["event_ids"] = np.arange(n)
        f["flavors"] = np.array([12, -12, 14, -14, 16])
        f["energies"] = 10 ** rng.uniform(17, 19, n)
        f["interaction_type"] = np.array(["cc", "nc", "cc", "nc", "cc"],
                                         dtype="S2")
        f["xx"] = rng.uniform(-1000, 1000, n)
        f["yy"] = rng.uniform(-1000, 1000, n)
        f["zz"] = rng.uniform(-2000, -100, n)
        f["zeniths"] = zeniths
        f["azimuths"] = azimuths
        f["inelasticity"] = rng.uniform(0, 1, n)

    io_ascii.hdf5_to_arasim(hdf5_in, ara_out, avg_depth=180.0)
    data = io_ascii.read_ARA_eventlist(ara_out)
    assert len(data) == n
    with h5py.File(hdf5_in, "r") as f:
        # writer stores log10(E/eV) (NuRadioMCtoAraSim.py:35); the reader
        # interprets the column as log10(E/EeV) and adds 18
        # (readARAEventList.py:40) — assert each convention verbatim
        np.testing.assert_allclose(data["pnu"],
                                   np.asarray(f["energies"]) * 1e18, rtol=2e-2)
        np.testing.assert_allclose(data["elast_y"],
                                   np.asarray(f["inelasticity"]), atol=1e-4)
    # nnu_theta in the file is pi - zenith; reader maps through pi/2 - theta
    np.testing.assert_allclose(
        data["nnu_theta"], np.mod(0.5 * np.pi - (np.pi - zeniths), 2 * np.pi),
        atol=2e-4)
    # ccnc flags survived
    np.testing.assert_array_equal(data["currentint"], [1, 0, 1, 0, 1])

    # hdf5 conversion path
    h5_out = str(tmp_path / "eventlist.hdf5")
    io_ascii.ara_eventlist_to_hdf5(ara_out, h5_out)
    with h5py.File(h5_out, "r") as f:
        assert len(np.asarray(f["eventlist"])) == n


def test_dump_hdf5_smoke(tmp_path):
    from nuradiomc_tpu.sim.io_hdf5 import dump_hdf5

    path = str(tmp_path / "out.hdf5")
    n, nCh, nR = 2, 3, 2
    with h5py.File(path, "w") as f:
        f["event_group_ids"] = np.arange(n)
        for k in ("azimuths", "energies", "inelasticity", "xx", "yy",
                  "zeniths", "zz", "weights"):
            f[k] = np.linspace(0.1, 1.0, n)
        f["flavors"] = np.full(n, 12)
        f["interaction_type"] = np.array(["cc", "nc"], dtype="S2")
        f["multiple_triggers"] = np.ones((n, 1), dtype=bool)
        f["n_interaction"] = np.ones(n, dtype=int)
        f["triggered"] = np.ones(n, dtype=bool)
        g = f.create_group("station_101")
        for k in ("max_amp_shower_and_ray", "ray_tracing_C0", "ray_tracing_C1",
                  "travel_times", "travel_distances"):
            g[k] = np.random.default_rng(0).uniform(0.5, 1, (n, nCh, nR))
        g["ray_tracing_solution_type"] = np.ones((n, nCh, nR), dtype=int)
        for k in ("launch_vectors", "polarization", "receive_vectors"):
            g[k] = np.random.default_rng(1).normal(size=(n, nCh, nR, 3))

    buf = io.StringIO()
    dump_hdf5(path, out=buf)
    text = buf.getvalue()
    assert "station_101" in text
    assert text.count("\tstation_101") == n * nCh * nR


def test_plot_vertex_distribution_smoke():
    from nuradiomc_tpu.utils.plotting import plot_vertex_distribution

    rng = np.random.default_rng(0)
    n = 200
    fig, ax = plot_vertex_distribution(
        rng.uniform(-1000, 1000, n), rng.uniform(-1000, 1000, n),
        rng.uniform(-2000, -10, n), weights=rng.uniform(0, 1, n),
        trigger_name="test")
    assert ax.get_title() == "trigger: test"
    import matplotlib.pyplot as plt
    plt.close(fig)
