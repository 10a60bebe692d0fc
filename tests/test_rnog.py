"""RNO-G surface trigger + trigger board response
(trigger/rnog_surface_trigger.py, RNO_G/triggerBoardResponse.py)."""
import numpy as np
from scipy import signal as scisig

from nuradiomc_tpu.detector.detector import Detector
from nuradiomc_tpu.framework.event import Channel, Event, Station
from nuradiomc_tpu.reco.rnog import (
    TRIGGER_BOARD_AMPLIFICATIONS, estimate_noise_vrms, rnogSurfaceTrigger,
    schottky_diode, select_adc_gain, surface_trigger_bins, triggerBoardResponse)
from nuradiomc_tpu.utils import units


def _det_rnog():
    chans = {}
    for cid in (13, 16, 19):
        chans[str(cid)] = {
            "adc_n_samples": 1024, "adc_sampling_frequency": 2.0,
            "ant_orientation_phi": 0.0, "ant_orientation_theta": 180.0,
            "ant_position_x": float(cid), "ant_position_y": 0.0,
            "ant_position_z": -2.0, "ant_rotation_phi": 90.0,
            "ant_rotation_theta": 90.0, "ant_type": "analytic_LPDA",
            "amp_type": "", "cab_time_delay": 0.0, "adc_nbits": None,
            "channel_id": cid, "station_id": 11,
            "trigger_adc_noise_count": 2, "trigger_adc_nbits": 8,
            "trigger_adc_max_voltage": 1.0 * units.volt,
            "trigger_adc_min_voltage": -1.0 * units.volt,
        }
    return Detector({"channels": chans,
                     "stations": {"1": {"station_id": 11, "pos_altitude": 0,
                                        "pos_easting": 0, "pos_northing": 0}}})


def test_schottky_diode_coefficients():
    tr = np.array([0.0, 0.01, 0.02])
    # 250K/2V: a=55.038, b=-2.13e-5; v_out = a v^2 + b
    out = 55.0380132 * tr ** 2 - 2.13447979e-05
    np.testing.assert_array_equal(
        schottky_diode(tr, threshold=1e-3), out > 1e-3)
    # all operating points are tabulated
    for T in (250, 273, 300):
        for Vb in (0.5, 1.0, 1.5, 2.0):
            schottky_diode(tr, 1e-3, T * units.kelvin, Vb * units.volt)


def test_surface_trigger_bins_matches_manual_chain():
    rng = np.random.default_rng(0)
    fs, n = 2.0, 1024
    tr = rng.normal(0, 1e-3, n)
    tr[400:410] += 0.2
    bins = surface_trigger_bins(tr, fs, threshold=1e-3)[0]
    # manual: cheby1 analog response, -10 dB, diode
    ff = np.fft.rfftfreq(n, 1.0 / fs)
    b, a = scisig.cheby1(3, 5, [0.08, 0.18], "bandpass", analog=True)
    _, h = scisig.freqs(b, a, ff[ff > 0])
    resp = np.zeros_like(ff, dtype=complex)
    resp[ff > 0] = h
    filt = np.fft.irfft(np.fft.rfft(tr) * resp, n) * 10 ** (-0.5)
    expected = 55.0380132 * filt ** 2 - 2.13447979e-05 > 1e-3
    np.testing.assert_array_equal(bins, expected)
    assert bins.any()


def test_surface_trigger_module_coincidence():
    det = _det_rnog()
    fs, n = 2.0, 1024
    rng = np.random.default_rng(1)

    def make_station(n_pulsed):
        st = Station(11)
        for k, cid in enumerate((13, 16, 19)):
            tr = rng.normal(0, 1e-4, n)
            if k < n_pulsed:
                t = np.arange(n) / fs
                tr += 0.3 * np.exp(-0.5 * ((t - 250) / 4) ** 2) \
                    * np.sin(2 * np.pi * 0.13 * t)
            ch = Channel(cid)
            ch.set_trace(tr, fs)
            st.add_channel(ch)
        return st

    trig = rnogSurfaceTrigger()
    trig.begin()
    evt = Event(0, 0)

    st2 = make_station(2)
    trig.run(evt, st2, det, threshold=5e-3, number_coincidences=2)
    assert st2.get_trigger("rnog_surface_trigger").has_triggered()

    st0 = make_station(0)
    trig.run(evt, st0, det, threshold=5e-3, number_coincidences=2)
    assert not st0.get_trigger("rnog_surface_trigger").has_triggered()

    st1 = make_station(1)
    trig.run(evt, st1, det, threshold=5e-3, number_coincidences=2)
    assert not st1.get_trigger("rnog_surface_trigger").has_triggered()


def test_adc_gain_selection():
    # ideal vrms for 2 noise counts on an 8-bit 2V ADC: 2*2/255 V
    ideal = 2 * 2.0 / 255
    gain, after = select_adc_gain(0.001, ideal)
    assert gain in TRIGGER_BOARD_AMPLIFICATIONS
    assert after >= ideal
    # one gain step lower would undershoot
    idx = list(TRIGGER_BOARD_AMPLIFICATIONS).index(gain)
    if idx > 0:
        assert 0.001 * TRIGGER_BOARD_AMPLIFICATIONS[idx - 1] <= ideal
    # saturation: vrms so small even max gain undershoots -> max gain
    gain_sat, _ = select_adc_gain(1e-9, ideal)
    assert gain_sat == TRIGGER_BOARD_AMPLIFICATIONS[-1]


def test_trigger_board_response_run():
    det = _det_rnog()
    fs, n = 2.0, 2048
    rng = np.random.default_rng(2)
    st = Station(11)
    sigma = 0.8e-3
    for cid in (13, 16, 19):
        ch = Channel(cid)
        ch.set_trace(rng.normal(0, sigma, n), fs)
        st.add_channel(ch)
    board = triggerBoardResponse()
    board.begin(adc_output="voltage")
    evt = Event(0, 0)
    eq = board.run(evt, st, det, trigger_channels=[13, 16, 19])
    ideal = (2.0 / 255) * 2
    # equalized vrms is >= ideal and within one gain step of it
    assert np.all(eq >= ideal * 0.999)
    assert np.all(eq <= ideal * 1.6 * 1.3)
    # traces are quantized to the ADC grid
    lsb = 2.0 / 255
    tr = np.asarray(st.get_channel(13).get_trace())
    steps = np.unique(np.round(np.diff(np.unique(np.round(tr / lsb, 6)))))
    assert np.allclose(np.asarray(st.get_channel(13).get_trace()) % lsb, 0,
                       atol=1e-9) or len(steps) >= 1
    # estimate_noise_vrms recovers the gained-up noise level
    est = estimate_noise_vrms(tr)
    assert est > sigma  # gain was applied


def test_cr_rnog_template_creator(tmp_path):
    """crRNOGTemplateCreator writes a Templates-layout pickle with plausible
    surface-amp-folded traces (modules/RNO_G/crRNOGTemplateCreator.py)."""
    import pickle

    from nuradiomc_tpu.reco.rnog import crRNOGTemplateCreator

    det = {"channels": {"1": {
        "adc_n_samples": 2048, "adc_sampling_frequency": 3.2,
        "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
        "ant_position_x": 0.0, "ant_position_y": 0.0, "ant_position_z": -2.0,
        "ant_rotation_phi": 160.0, "ant_rotation_theta": 90.0,
        "ant_type": "analytic_LPDA", "amp_type": "rno_surface",
        "cab_time_delay": 0.0, "adc_nbits": None,
        "channel_id": 0, "station_id": 101}},
        "stations": {"1": {"station_id": 101, "pos_altitude": 0,
                           "pos_easting": 0, "pos_northing": 0}}}

    creator = crRNOGTemplateCreator()
    creator.begin(det, str(tmp_path))
    creator.set_template_parameter(
        template_run_id=(0, 0), template_event_id=(0, 1),
        template_station_id=(101, 101), template_channel_id=(0, 0),
        efield_width=(5, 2), antenna_rotation=(160, 160),
        cr_zenith=(55, 55), cr_azimuth=(0, 0))
    events = creator.run(return_templates=True)
    assert len(events) == 2

    with open(tmp_path / "templates_cr_station_101.pickle", "rb") as f:
        data = pickle.load(f)
    leaf = data[0][np.deg2rad(55)][np.deg2rad(0)]
    assert set(leaf) == {5, 2}
    for width, trace in leaf.items():
        assert trace.shape[0] >= 2048 - 1
        assert np.max(np.abs(trace)) > 0
    # the narrower efield is broader in frequency -> different pulse shape
    assert not np.allclose(leaf[5][:2000], leaf[2][:2000])


def test_rnog_amp_response_loader():
    """RNO-G placeholder chains load, interpolate, and temperature-correct
    (detector/RNO_G/analog_components.py:10-105)."""
    from nuradiomc_tpu.detector.hardware_response import load_rnog_amp_response
    from nuradiomc_tpu.utils import units

    ff = np.linspace(0.05, 0.7, 50) * units.GHz
    for amp_type, min_gain in (("rno_surface", 1.0), ("iglu", 1.0),
                               ("phased_array", 0.5)):  # ULP-216 is passive
        amp = load_rnog_amp_response(amp_type)
        g = amp["gain"](ff)
        ph = amp["phase"](ff)
        assert np.max(g) > min_gain
        np.testing.assert_allclose(np.abs(ph), 1.0, atol=1e-12)
    # temperature correction shifts the gain
    amp = load_rnog_amp_response("rno_surface")
    g_cold = amp["gain"](ff, temp=243.15)
    g_warm = amp["gain"](ff, temp=313.15)
    assert not np.allclose(g_cold, g_warm)
