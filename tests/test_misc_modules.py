"""Coherent-sum statistics, ASCII event-list round trip, trace stats
(trace_utilities.py:420-720, generator_ASCII.py, hdf5_to_ASCII.py)."""
import numpy as np

from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.event import Channel, Event, Station
from nuradiomc_tpu.utils import trace_stats as ts

rnog = par.stationParametersRNOG


def test_trace_stats_basics():
    rng = np.random.default_rng(0)
    noise = rng.normal(0, 1.0, 4096)
    t = np.arange(4096)
    pulse = noise + 20 * np.exp(-0.5 * ((t - 2000) / 5.0) ** 2)

    assert ts.get_split_trace_noise_RMS(pulse) < 1.5   # ignores the pulse
    snr = ts.get_signal_to_noise_ratio(pulse, 1.0, window_size=10)
    assert snr > 8
    assert ts.get_impulsivity(pulse) > ts.get_impulsivity(noise)
    assert ts.get_entropy(noise) > ts.get_entropy(np.zeros(4096) + 1e-9)
    assert ts.get_kurtosis(pulse) > ts.get_kurtosis(noise)
    tk = ts.get_teager_kaiser_energy(pulse)
    assert np.argmax(tk) in range(1990, 2011)


def test_coherent_sum_aligns():
    rng = np.random.default_rng(1)
    t = np.arange(2048)
    base = np.exp(-0.5 * ((t - 1000) / 4.0) ** 2) * np.sin(0.5 * t)
    shifts = [0, 37, -81, 140]
    traces = [np.roll(base, s) + rng.normal(0, 0.05, 2048) for s in shifts]
    csw = ts.get_coherent_sum(traces[1:], traces[0])
    # aligned sum amplifies the pulse ~4x over a single trace
    assert np.max(np.abs(csw)) > 3.0 * np.max(np.abs(base))


def test_coherent_sum_module():
    from nuradiomc_tpu.reco.rnog_data import stationCoherentlySummedWaveforms
    rng = np.random.default_rng(2)
    t = np.arange(2048)
    base = np.exp(-0.5 * ((t - 900) / 4.0) ** 2) * np.sin(0.5 * t)
    st = Station(11)
    for cid, s in enumerate([0, 25, -60, 90]):
        ch = Channel(cid)
        ch.set_trace(np.roll(base, s) + rng.normal(0, 0.05, 2048), 3.2)
        st.add_channel(ch)
    mod = stationCoherentlySummedWaveforms()
    mod.begin()
    mod.run(Event(0, 0), st)
    assert st[rnog.coherent_snr] > 10
    assert 0 < st[rnog.coherent_impulsivity] <= 1
    assert st[rnog.coherent_entropy] > 0


def test_ascii_roundtrip(tmp_path):
    import h5py

    from nuradiomc_tpu.sim import evtgen, io_ascii
    from nuradiomc_tpu.utils import units

    inp = str(tmp_path / "in.hdf5")
    vol = {"fiducial_rmin": 0, "fiducial_rmax": 2 * units.km,
           "fiducial_zmin": -2 * units.km, "fiducial_zmax": 0}
    evtgen.generate_eventlist_cylinder(inp, 50, 1e18, 1e19, vol, seed=3)

    txt = str(tmp_path / "events.txt")
    io_ascii.hdf5_to_ascii(inp, txt)
    ev = io_ascii.read_ascii_eventlist(txt)
    with h5py.File(inp) as f:
        np.testing.assert_array_equal(ev["flavors"], np.asarray(f["flavors"]))
        np.testing.assert_allclose(ev["energies"],
                                   np.asarray(f["energies"]), rtol=1e-4)
        np.testing.assert_allclose(ev["zz"], np.asarray(f["zz"]), atol=1e-3)
        np.testing.assert_array_equal(ev["interaction_type"],
                                      np.asarray(f["interaction_type"]))

    back = str(tmp_path / "back.hdf5")
    io_ascii.ascii_to_hdf5(txt, back, volume_attrs={"n_events": 50})
    with h5py.File(back) as f:
        assert f.attrs["n_events"] == 50
        assert len(np.asarray(f["xx"])) == len(ev["xx"])
        assert set(np.unique(np.asarray(f["shower_type"]))) <= {b"em", b"had"}


def test_detector_browser(tmp_path):
    import json

    from nuradiomc_tpu.detector import browser

    chans = {str(c + 1): {
        "adc_n_samples": 256, "adc_sampling_frequency": 1.0,
        "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
        "ant_position_x": float(c), "ant_position_y": 0.0,
        "ant_position_z": -50.0 - 10 * c, "ant_rotation_phi": 90.0,
        "ant_rotation_theta": 90.0, "ant_type": "analytic_VPol",
        "amp_type": "", "cab_time_delay": 0.0, "adc_nbits": None,
        "channel_id": c, "station_id": 3} for c in range(4)}
    det_file = str(tmp_path / "det.json")
    with open(det_file, "w") as f:
        json.dump({"channels": chans,
                   "stations": {"1": {"station_id": 3, "pos_altitude": 0,
                                      "pos_easting": 0, "pos_northing": 0}}}, f)
    browser.main([det_file, "--out", str(tmp_path)])
    import os
    assert os.path.exists(str(tmp_path / "station_3.png"))
