"""Direction fitter test: reconstruct a known plane-wave arrival direction
from four channels with geometry-consistent delays."""
import numpy as np

from nuradiomc_tpu.detector.detector import Detector
from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.event import Channel, Event, Station
from nuradiomc_tpu.reco.direction import correlationDirectionFitter, get_time_delay_from_direction
from nuradiomc_tpu.utils import units

stnp = par.stationParameters


def _det_four():
    chans = {}
    # ARIANNA-style square of 4 LPDAs, 6 m baseline
    pos = [(3, 0), (0, 3), (-3, 0), (0, -3)]
    for cid, (x, y) in enumerate(pos):
        chans[str(cid + 1)] = {
            "adc_n_samples": 512, "adc_sampling_frequency": 1.0,
            "ant_orientation_phi": 0.0, "ant_orientation_theta": 180.0,
            "ant_position_x": x, "ant_position_y": y, "ant_position_z": -1.0,
            "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
            "ant_type": "analytic_LPDA", "amp_type": "", "cab_time_delay": 0.0,
            "adc_nbits": None, "channel_id": cid, "station_id": 7,
        }
    return Detector({"channels": chans,
                     "stations": {"1": {"station_id": 7, "pos_altitude": 0,
                                        "pos_easting": 0, "pos_northing": 0}}})


def test_reconstructs_known_direction():
    det = _det_four()
    zen_true, az_true = np.deg2rad(55.0), np.deg2rad(127.0)
    fs = 5.0
    N = 512
    t = np.arange(N) / fs

    def pulse(delay):
        return np.exp(-0.5 * ((t - 50.0 - delay) / 2.0) ** 2) * \
            np.sin(2 * np.pi * 0.3 * (t - 50.0 - delay))

    evt = Event(0, 0)
    st = Station(7)
    for cid in range(4):
        p = det.get_relative_position(7, cid)
        delay = get_time_delay_from_direction(zen_true, az_true, p, n=1.0)
        ch = Channel(cid)
        ch.set_trace(pulse(delay), fs, trace_start_time=0.0)
        st.add_channel(ch)
    evt.set_station(st)

    fitter = correlationDirectionFitter()
    fitter.begin()
    fitter.run(evt, st, det, n_index=1.0, channel_pairs=((0, 2), (1, 3)))

    # resolution limited by integer-sample correlation bins (the reference
    # has the same truncation, correlationDirectionFitter.py:88-90)
    assert abs(st[stnp.zenith] - zen_true) < 2.5 * units.deg
    d_az = np.mod(st[stnp.azimuth] - az_true + np.pi, 2 * np.pi) - np.pi
    assert abs(d_az) < 2.5 * units.deg


def test_beamforming_fitter_recovers_direction():
    """cc-beam fitter recovers a theta-polarized plane wave synthesized
    through the same antenna model (beamFormingDirectionFitter.py:84-231)."""
    from nuradiomc_tpu.ops import antenna as antenna_ops
    from nuradiomc_tpu.reco.direction import beamFormingDirectionFitter

    det = _det_four()
    zen_true, az_true = np.deg2rad(122.0), np.deg2rad(203.0)
    fs, N = 1.0, 512
    t = np.arange(N) / fs
    freqs = np.fft.rfftfreq(N, 1.0 / fs)
    pulse = np.exp(-0.5 * ((t - 200.0) / 3.0) ** 2) * \
        np.sin(2 * np.pi * 0.2 * (t - 200.0))
    E_spec = np.fft.rfft(pulse)

    evt = Event(0, 0)
    st = Station(7)
    for cid in range(4):
        p = det.get_relative_position(7, cid)
        delay = get_time_delay_from_direction(zen_true, az_true, p, n=1.0)
        rot = antenna_ops.antenna_rotation_matrix(
            *det.get_antenna_orientation(7, cid))
        tpl = antenna_ops.build_analytic_template("analytic_LPDA", freqs)
        vt, _ = antenna_ops.analytic_vel(zen_true, az_true, rot, tpl, 0)
        V = np.asarray(vt) * E_spec * np.exp(-2j * np.pi * freqs * delay)
        ch = Channel(cid)
        ch.set_frequency_spectrum(V, fs)
        ch.set_trace_start_time(0.0)
        st.add_channel(ch)
    evt.set_station(st)

    fitter = beamFormingDirectionFitter()
    fitter.begin()
    fitter.run(evt, st, det, polarization=0, n_index=1.0,
               channels=[0, 1, 2, 3],
               passband=(120 * units.MHz, 300 * units.MHz))

    assert abs(st[stnp.zenith] - zen_true) < 2.5 * units.deg
    d_az = np.mod(st[stnp.azimuth] - az_true + np.pi, 2 * np.pi) - np.pi
    assert abs(d_az) < 2.5 * units.deg
