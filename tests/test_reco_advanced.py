"""Tests for the cleaning and advanced reconstruction modules."""
import numpy as np
import pytest

from nuradiomc_tpu.detector.detector import Detector
from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.event import Channel, Event, Station, Trigger
from nuradiomc_tpu.reco import advanced, cleaning
from nuradiomc_tpu.utils import units
from nuradiomc_tpu.utils.constants import speed_of_light

chp = par.channelParameters
stnp = par.stationParameters


def _simple_det(positions, fs=1.0, n_samples=256):
    chans = {}
    for cid, p in enumerate(positions):
        chans[str(cid + 1)] = {
            "adc_n_samples": n_samples, "adc_sampling_frequency": fs,
            "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
            "ant_position_x": p[0], "ant_position_y": p[1], "ant_position_z": p[2],
            "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
            "ant_type": "analytic_VPol", "amp_type": "", "cab_time_delay": 0.0,
            "adc_nbits": None, "channel_id": cid, "station_id": 3,
        }
    return Detector({"channels": chans,
                     "stations": {"1": {"station_id": 3}}})


def test_cw_notch_and_sinewave_subtraction():
    fs = 2.0
    t = np.arange(2048) / fs
    rng = np.random.default_rng(0)
    clean = rng.normal(0, 0.01, len(t))
    cw = 0.5 * np.sin(2 * np.pi * 0.2 * t + 0.7)
    evt, st = Event(0, 0), Station(3)
    ch = Channel(0)
    ch.set_trace(clean + cw, fs)
    st.add_channel(ch)
    evt.set_station(st)

    sub = advanced.__dict__  # quiet linters
    mod = cleaning.channelSinewaveSubtraction()
    mod.begin(cw_frequency=0.2)
    mod.run(evt, st, None)
    residual_power = np.var(ch.get_trace())
    assert residual_power < 2 * np.var(clean)

    # integer-period line for the notch test (no spectral leakage skirt)
    cw_int = 0.5 * np.sin(2 * np.pi * 0.25 * t + 0.7)
    ch2 = Channel(1)
    ch2.set_trace(clean + cw_int, fs)
    st.add_channel(ch2)
    notch = cleaning.channelCWNotchFilter()
    notch.begin(threshold_db=10)
    notch.run(evt, st, None)
    assert np.var(ch2.get_trace()) < 2 * np.var(clean)


def test_stop_filter_pads_and_tapers():
    fs = 1.0
    evt, st = Event(0, 0), Station(3)
    ch = Channel(0)
    ch.set_trace(np.ones(256), fs, trace_start_time=10.0)
    st.add_channel(ch)
    evt.set_station(st)
    f = cleaning.channelStopFilter()
    f.run(evt, st, None, prepend=64 * units.ns, append=64 * units.ns)
    assert ch.get_number_of_samples() == 256 + 128
    assert ch.get_trace()[0] == 0.0
    assert abs(ch.get_trace_start_time() - (10.0 - 64.0)) < 1e-9


def test_readout_window_cutter():
    fs = 2.0
    det = _simple_det([(0, 0, -1)], fs=1.0, n_samples=128)
    evt, st = Event(0, 0), Station(3)
    ch = Channel(0)
    trace = np.zeros(1024)
    trace[700] = 1.0
    ch.set_trace(trace, fs, trace_start_time=0.0)
    st.add_channel(ch)
    trig = Trigger("t", [0], pre_trigger_times=55.0)
    trig.set_triggered(True)
    trig.set_trigger_time(350.0)  # the pulse time
    st.set_trigger(trig)
    evt.set_station(st)
    cut = cleaning.channelReadoutWindowCutter()
    cut.run(evt, st, det)
    # 128 det samples at 1 GHz = 128 ns -> 256 samples at 2 GHz
    assert ch.get_number_of_samples() == 256
    assert abs(ch.get_trace_start_time() - (350.0 - 55.0)) < 1e-9
    assert np.max(ch.get_trace()) == 1.0  # pulse inside the window


def test_spherical_and_planewave_fitters():
    positions = [(0, 0, -100), (20, 0, -100), (0, 20, -100), (0, 0, -140)]
    det = _simple_det(positions)
    evt, st = Event(0, 0), Station(3)
    src = np.array([150.0, 80.0, -400.0])
    n_index = 1.75
    for cid, p in enumerate(positions):
        ch = Channel(cid)
        ch.set_trace(np.zeros(64), 1.0)
        d = np.linalg.norm(src - np.asarray(p, dtype=float))
        ch[chp.signal_time] = d * n_index / speed_of_light
        st.add_channel(ch)
    evt.set_station(st)

    fit = advanced.sphericalWaveFitter()
    fit.begin(channel_ids=[0, 1, 2, 3])
    pos, chi2 = fit.run(evt, st, det, start_pulser_position=[100, 100, -350])
    # small-baseline arrays constrain the direction much better than the
    # radial distance; check direction to 3 deg and range to 30%
    u_fit = pos / np.linalg.norm(pos)
    u_true = src / np.linalg.norm(src)
    assert np.arccos(np.clip(u_fit @ u_true, -1, 1)) < np.deg2rad(3.0), pos
    assert abs(np.linalg.norm(pos) / np.linalg.norm(src) - 1) < 0.3

    # plane wave from a far source
    far = np.array([5000.0, 2000.0, 3000.0])
    u = far / np.linalg.norm(far)
    for cid, p in enumerate(positions):
        st.get_channel(cid)[chp.signal_time] = \
            -1.0 / speed_of_light * np.dot(np.asarray(p, dtype=float), u)
    pw = advanced.planeWaveDirectionFitter()
    pw.run(evt, st, det, channel_ids=[0, 1, 2, 3], n_index=1.0)
    zen_true = np.arccos(u[2])
    assert abs(st[stnp.zenith] - zen_true) < np.deg2rad(2.0)


class _GalacticDet:
    """Surface LPDA + shallow in-ice dipole at mooresbay."""

    def get_site_coordinates(self, station_id):
        return -78.74, 165.02

    def get_relative_position(self, station_id, channel_id):
        return np.array([3.0, 0.0, 1.0]) if channel_id == 0 \
            else np.array([0.0, 0.0, -2.0])

    def get_antenna_orientation(self, station_id, channel_id):
        return np.deg2rad([180.0, 0.0, 90.0, 90.0])

    def get_antenna_model(self, station_id, channel_id):
        return "analytic_LPDA"


def test_galactic_noise_spectral_shape():
    t = advanced.cane_galactic_temperature(np.array([30, 100, 300]) * units.MHz)
    assert t[0] > t[1] > t[2] > 0  # steeply falling with frequency
    assert 1e3 < t[0] < 1e6  # tens of MHz: thousands of kelvin


def test_galactic_noise_directional_folding():
    """Full sky-map folding (channelGalacticNoiseAdder.py:54-408): noise is
    added with the Cane spectral shape, in-ice channels see the refracted
    (Fresnel-transmitted) field, and the power scales with the sky model."""
    evt, st = Event(0, 0), Station(3)
    for cid in (0, 1):
        ch = Channel(cid)
        ch.set_trace(np.zeros(4096), 2.0)
        st.add_channel(ch)
    evt.set_station(st)
    st.set_station_time(1.4e9)  # unix seconds
    det = _GalacticDet()

    g = advanced.channelGalacticNoiseAdder()
    g.begin(seed=1, n_pixels=64)
    g.run(evt, st, det)
    tr0 = np.array(st.get_channel(0).get_trace())
    assert np.std(tr0) > 0
    assert np.std(st.get_channel(1).get_trace()) > 0
    # spectral content concentrated at low frequencies (steep Cane spectrum)
    spec = np.abs(st.get_channel(0).get_frequency_spectrum())
    ff = st.get_channel(0).get_frequencies()
    low = spec[(ff > 0.02) & (ff < 0.1)].mean()
    high = spec[(ff > 0.5) & (ff < 0.9)].mean()
    assert low > 3 * high

    # a 100x hotter sky gives ~10x the field amplitude
    evt2, st2 = Event(0, 1), Station(3)
    ch = Channel(0)
    ch.set_trace(np.zeros(4096), 2.0)
    st2.add_channel(ch)
    evt2.set_station(st2)
    st2.set_station_time(1.4e9)
    g2 = advanced.channelGalacticNoiseAdder()
    g2.begin(seed=1, n_pixels=64, skymodel=lambda f, l, b:
             100 * advanced.cane_galactic_temperature(f) * units.kelvin)
    g2.run(evt2, st2, det)
    ratio = np.std(st2.get_channel(0).get_trace()) / np.std(tr0)
    assert 7 < ratio < 13

    # pixel grid is equal-area and the coordinate chain is consistent:
    # a pixel at the NGP has dec ~ +27 deg
    ra, dec = advanced.galactic_to_equatorial(np.array([0.0]), np.array([np.pi / 2]))
    assert abs(np.rad2deg(dec[0]) - 27.13) < 0.01
    assert abs(np.rad2deg(ra[0]) - 192.86) < 0.01
