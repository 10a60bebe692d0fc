"""Analytic-pulse E-field fit: recover fluence, slope, and polarization of a
synthesized cosmic-ray pulse (voltageToAnalyticEfieldConverter.py:240-731)."""
import numpy as np

from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.event import Channel, Event, Station
from nuradiomc_tpu.ops import antenna as antenna_ops
from nuradiomc_tpu.reco.analytic_efield import (
    analytic_pulse_freq, voltageToAnalyticEfieldConverter)
from nuradiomc_tpu.reco.direction import get_time_delay_from_direction
from nuradiomc_tpu.utils import units

stnp = par.stationParameters
efp = par.electricFieldParameters


def _det_four_mixed():
    """Four LPDAs with DIFFERENT rotations: each channel sees a different
    theta/phi mixture, which is what makes the two amplitudes separable
    (an ARIANNA-style station; with identical orientations the fit is
    degenerate by construction)."""
    from nuradiomc_tpu.detector.detector import Detector
    chans = {}
    pos = [(3, 0), (0, 3), (-3, 0), (0, -3)]
    for cid, (x, y) in enumerate(pos):
        chans[str(cid + 1)] = {
            "adc_n_samples": 512, "adc_sampling_frequency": 1.0,
            "ant_orientation_phi": 0.0, "ant_orientation_theta": 180.0,
            "ant_position_x": x, "ant_position_y": y, "ant_position_z": -1.0,
            "ant_rotation_phi": 45.0 + 90.0 * cid, "ant_rotation_theta": 90.0,
            "ant_type": "analytic_LPDA", "amp_type": "", "cab_time_delay": 0.0,
            "adc_nbits": None, "channel_id": cid, "station_id": 7,
        }
    return Detector({"channels": chans,
                     "stations": {"1": {"station_id": 7, "pos_altitude": 0,
                                        "pos_easting": 0, "pos_northing": 0}}})


def test_pulse_normalization():
    """Reference-identical normalization: integrated fluence scales as
    amp * fs^2 / n (verified bit-identical vs analytic_pulse.py:30-82; the
    butterworth band shape reshapes the integral by a few percent)."""
    from nuradiomc_tpu.reco.analytic_efield import (
        CONVERSION_FACTOR_INTEGRATED_SIGNAL, analytic_pulse)
    fs, n = 1.0, 1024
    A = 2.5e-3
    tr = analytic_pulse(A, -1.5, 0.0, n, fs, bandpass=[0.1, 0.5])
    fluence = np.sum(tr ** 2) / fs * CONVERSION_FACTOR_INTEGRATED_SIGNAL
    assert abs(fluence / (A * fs ** 2 / n) - 1) < 0.05
    tr2 = analytic_pulse(2 * A, -1.5, 0.0, n, fs, bandpass=[0.1, 0.5])
    fluence2 = np.sum(tr2 ** 2) / fs * CONVERSION_FACTOR_INTEGRATED_SIGNAL
    np.testing.assert_allclose(fluence2, 2 * fluence, rtol=1e-10)


def test_recovers_synthetic_cr_pulse():
    det = _det_four_mixed()
    zen, az = np.deg2rad(140.0), np.deg2rad(30.0)
    fs, n = 1.0, 512
    ff = np.fft.rfftfreq(n, 1.0 / fs)
    band = [0.1, 0.5]
    A_theta, A_phi, slope_true = 4e-4, 1.6e-3, -2.2

    pt = analytic_pulse_freq(A_theta, slope_true, 0.0, n, fs, bandpass=band)
    pp = analytic_pulse_freq(A_phi, slope_true, 0.0, n, fs, bandpass=band)
    # put the pulse mid-trace so the windowed chi2 sees it
    shift = np.exp(-2j * np.pi * ff * 250.0)

    evt = Event(0, 0)
    st = Station(7)
    st[stnp.zenith] = zen
    st[stnp.azimuth] = az
    rng = np.random.default_rng(3)
    for cid in range(4):
        rot = antenna_ops.antenna_rotation_matrix(
            *det.get_antenna_orientation(7, cid))
        tpl = antenna_ops.build_analytic_template("analytic_LPDA", ff)
        vt, vp = antenna_ops.analytic_vel(zen, az, rot, tpl, 0)
        p = det.get_relative_position(7, cid)
        delay = get_time_delay_from_direction(zen, az, p, n=1.0)
        V = (np.asarray(vt) * pt + np.asarray(vp) * pp) * shift \
            * np.exp(-2j * np.pi * ff * delay)
        ch = Channel(cid)
        ch.set_frequency_spectrum(V, fs)
        ch.set_trace_start_time(0.0)
        tr = ch.get_trace() + rng.normal(0, 2e-10, n)
        ch.set_trace(tr, fs)
        st.add_channel(ch)
    evt.set_station(st)

    conv = voltageToAnalyticEfieldConverter()
    conv.begin()
    ef = conv.run(evt, st, det, use_channels=[0, 1, 2, 3], bandpass=band,
                  n_index=1.0, noise_RMS=2e-10)

    fluence = ef[efp.signal_energy_fluence]
    # expected fluence of the true phi pulse (same parameterization)
    from nuradiomc_tpu.reco.analytic_efield import (
        CONVERSION_FACTOR_INTEGRATED_SIGNAL, analytic_pulse)
    true_phi = analytic_pulse(A_phi, slope_true, 0.0, n, fs, bandpass=band)
    fl_true = np.sum(true_phi ** 2) / fs * CONVERSION_FACTOR_INTEGRATED_SIGNAL
    assert abs(fluence[2] / fl_true - 1) < 0.2       # dominant pol amplitude
    pol_true = np.arctan2(A_phi ** 0.5, A_theta ** 0.5)
    assert abs(ef[efp.polarization_angle] - pol_true) < 10 * units.deg
    assert abs(ef[efp.cr_spectrum_slope] - slope_true) < 0.6
    assert len(st.get_electric_fields()) == 1
