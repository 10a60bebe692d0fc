"""Reconstruction-module tests: forward-fold / unfold round trip (mirrors the
reference NuRadioReco/test/voltageToEfieldConverter/test-unfolding.py) and
channel-processing module behavior."""
import numpy as np
import pytest

from nuradiomc_tpu.detector.detector import Detector
from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.event import ElectricField, Event, SimStation, Station
from nuradiomc_tpu.reco import channel_processing as cp
from nuradiomc_tpu.reco import efield_converters as ec
from nuradiomc_tpu.utils import units

efp = par.electricFieldParameters
stnp = par.stationParameters


def _det_two_pol():
    def ch(cid, ant):
        return {
            "adc_n_samples": 256, "adc_sampling_frequency": 1.0,
            "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
            "ant_position_x": 0.0, "ant_position_y": 0.0, "ant_position_z": -10.0,
            "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
            "ant_type": ant, "amp_type": "", "cab_time_delay": 7.0,
            "adc_nbits": None, "channel_id": cid, "station_id": 42,
        }
    return Detector({
        "channels": {"1": ch(0, "analytic_VPol"), "2": ch(1, "analytic_HPol")},
        "stations": {"1": {"pos_altitude": 0, "pos_easting": 0, "pos_northing": 0,
                           "station_id": 42}},
    })


@pytest.fixture
def folded_event():
    det = _det_two_pol()
    evt = Event(0, 0)
    station = Station(42)
    sim = SimStation(42)

    fs = 2.0
    N = 512
    ff = np.fft.rfftfreq(N, 1 / fs)
    # band-limited pulse in eTheta and ePhi with different shapes
    spec = np.zeros((3, len(ff)), dtype=complex)
    band = (ff > 0.15) & (ff < 0.45)
    spec[1, band] = np.exp(-((ff[band] - 0.25) / 0.1) ** 2) * np.exp(2j * np.pi * ff[band] * 30)
    spec[2, band] = 0.5 * np.exp(-((ff[band] - 0.3) / 0.08) ** 2) * np.exp(2j * np.pi * ff[band] * 28)

    zenith, azimuth = np.deg2rad(70.0), np.deg2rad(30.0)
    ef = ElectricField([0, 1], position=np.zeros(3))
    ef.set_frequency_spectrum(spec, fs)
    ef.set_trace_start_time(100.0)
    ef[efp.zenith] = zenith
    ef[efp.azimuth] = azimuth
    sim.add_electric_field(ef)
    station.set_sim_station(sim)
    station[stnp.zenith] = zenith
    station[stnp.azimuth] = azimuth
    evt.set_station(station)
    return evt, station, det, spec, fs


def test_forward_fold_and_unfold_roundtrip(folded_event):
    evt, station, det, spec_in, fs = folded_event

    conv = ec.efieldToVoltageConverter()
    conv.begin()
    conv.run(evt, station, det)
    assert station.has_channel(0) and station.has_channel(1)
    # channels carry signal
    assert np.max(np.abs(station.get_channel(0).get_trace())) > 0

    unfold = ec.voltageToEfieldConverter()
    unfold.begin()
    unfold.run(evt, station, det, use_channels=[0, 1])

    rec = station.get_electric_fields()[-1]
    spec_out = rec.get_frequency_spectrum()
    ff_out = rec.get_frequencies()
    ff_in = np.fft.rfftfreq(512, 1 / fs)
    band = (ff_in > 0.18) & (ff_in < 0.42)

    # the reconstructed trace lives on a longer window -> denser frequency
    # grid; the V/GHz amplitude density is rate-independent, so compare
    # magnitudes interpolated onto the input grid (phases differ by the
    # window offset)
    for pol in (1, 2):
        a = np.abs(spec_in[pol][band])
        b = np.interp(ff_in[band], ff_out, np.abs(spec_out[pol]))
        # band-edge bins suffer from window leakage on the regridded trace;
        # compare in an L2 sense
        rel = np.linalg.norm(b - a) / np.linalg.norm(a)
        assert rel < 0.03, rel


def test_signal_reconstructor_and_filters(folded_event):
    evt, station, det, spec_in, fs = folded_event
    conv = ec.efieldToVoltageConverter()
    conv.begin()
    conv.run(evt, station, det)

    bp = cp.channelBandPassFilter()
    bp.run(evt, station, det, passband=[0.1, 0.5], filter_type="rectangular")

    rec = cp.channelSignalReconstructor()
    rec.begin()
    rec.run(evt, station, det)
    ch = station.get_channel(0)
    assert ch[par.channelParameters.maximum_amplitude] > 0
    assert ch[par.channelParameters.maximum_amplitude_envelope] >= \
        ch[par.channelParameters.maximum_amplitude]

    # provenance recorded
    mods = [name for name, _, _ in evt.iter_modules(42)]
    assert "efieldToVoltageConverter" in mods
    assert "channelBandPassFilter" in mods


def test_resampler_and_cable_delay(folded_event):
    evt, station, det, spec_in, fs = folded_event
    conv = ec.efieldToVoltageConverter()
    conv.begin()
    conv.run(evt, station, det)

    ch = station.get_channel(0)
    n0 = ch.get_number_of_samples()
    t0 = ch.get_trace_start_time()
    res = cp.channelResampler()
    res.run(evt, station, det, sampling_rate=1.0)
    assert ch.get_number_of_samples() == n0 // 2

    cd = cp.channelAddCableDelay()
    cd.run(evt, station, det, mode="subtract")
    assert abs(ch.get_trace_start_time() - (t0 - 7.0)) < 1e-9


def test_noise_adder_rms():
    rng_mod = cp.channelGenericNoiseAdder()
    rng_mod.begin(seed=42)
    fs, N = 2.0, 8192
    amp = 0.01
    tr = rng_mod.bandlimited_noise(None, None, N, fs, amp, type="rayleigh")
    # RMS approximately the requested amplitude
    assert abs(np.std(tr) / amp - 1) < 0.1


def test_noise_gaussian_sampler_distribution():
    """The "gaussian" sampler must reproduce the "phase" sampler's
    DISTRIBUTION exactly (Rayleigh amplitude x uniform phase == circular
    complex gaussian): same post-filter RMS, same per-bin amplitude
    distribution (KS-style quantile compare), real DC/Nyquist bins."""
    import jax
    import jax.numpy as jnp

    from nuradiomc_tpu.ops import noise as noise_ops

    fs, N, amp = 2.0, 2048, 0.01
    keys = jax.random.split(jax.random.PRNGKey(7), 256)

    def draw(sampler):
        return jax.vmap(lambda k: noise_ops.bandlimited_noise_spectrum(
            k, N, fs, amp, None, fs / 2, type="rayleigh",
            sampler=sampler))(keys)

    sp = np.asarray(draw("phase"))
    sg = np.asarray(draw("gaussian"))
    # identical support: zero outside the band, DC zero, Nyquist real
    assert np.all(sp[:, 0] == 0) and np.all(sg[:, 0] == 0)
    np.testing.assert_allclose(np.imag(sg[:, -1]), 0, atol=1e-12)
    np.testing.assert_allclose(np.imag(sp[:, -1]), 0, atol=1e-12)
    # time-domain RMS equal to the requested amplitude for both
    from nuradiomc_tpu.utils import fft as fft_utils
    for s in (sp, sg):
        tr = np.asarray(fft_utils.freq2time(jnp.asarray(s), fs, n=N))
        assert abs(np.std(tr) / amp - 1) < 0.05
    # per-bin amplitude quantiles agree (same Rayleigh distribution)
    a_p = np.sort(np.abs(sp[:, 1:-1]).ravel())
    a_g = np.sort(np.abs(sg[:, 1:-1]).ravel())
    q = np.linspace(0.01, 0.99, 50)
    qp = np.quantile(a_p, q)
    qg = np.quantile(a_g, q)
    np.testing.assert_allclose(qg, qp, rtol=0.02)
    # phases uniform: mean resultant of unit phasors ~ 0
    ph = sg[:, 1:-1].ravel()
    ph = ph[np.abs(ph) > 0] / np.abs(ph[np.abs(ph) > 0])
    assert np.abs(ph.mean()) < 0.01
