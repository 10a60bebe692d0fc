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


def test_voltage_to_efield_per_channel():
    from test_direction import _det_four
    from nuradiomc_tpu.ops import antenna as antenna_ops
    from nuradiomc_tpu.reco.efield_converters import (
        voltageToEfieldConverterPerChannel)

    stnp = par.stationParameters
    efp = par.electricFieldParameters
    det = _det_four()
    zen, az = np.deg2rad(120.0), np.deg2rad(45.0)
    fs, n = 1.0, 512
    ff = np.fft.rfftfreq(n, 1.0 / fs)
    E_true = np.zeros(len(ff), dtype=complex)
    band = (ff > 0.1) & (ff < 0.4)
    E_true[band] = np.exp(-ff[band] * 3) * np.exp(1j * 2 * np.pi * ff[band] * 200)

    st = Station(7)
    st[stnp.zenith] = zen
    st[stnp.azimuth] = az
    rot = antenna_ops.antenna_rotation_matrix(*det.get_antenna_orientation(7, 0))
    tpl = antenna_ops.build_analytic_template("analytic_LPDA", ff)
    vt, vp = antenna_ops.analytic_vel(zen, az, rot, tpl, 0)
    ch = Channel(0)
    ch.set_frequency_spectrum(np.asarray(vt) * E_true, fs)   # pure theta pol
    st.add_channel(ch)

    conv = voltageToEfieldConverterPerChannel()
    conv.begin()
    conv.run(Event(0, 0), st, det, pol=0)
    ef = st.get_electric_fields()[0]
    rec = np.asarray(ef.get_frequency_spectrum())[1]
    good = band & (np.abs(np.asarray(vt)) > 1e-3 * np.max(np.abs(np.asarray(vt))))
    np.testing.assert_allclose(rec[good], E_true[good], rtol=1e-8)


def test_antenna_dedispersion_flattens_phase():
    from test_direction import _det_four
    from nuradiomc_tpu.reco.advanced import channelAntennaDedispersion

    det = _det_four()
    fs, n = 1.0, 512
    rng = np.random.default_rng(4)
    st = Station(7)
    ch = Channel(0)
    ch.set_trace(rng.normal(0, 1.0, n), fs)
    st.add_channel(ch)
    before = np.asarray(ch.get_frequency_spectrum()).copy()
    mod = channelAntennaDedispersion()
    mod.begin()
    mod.run(Event(0, 0), st, det)
    after = np.asarray(ch.get_frequency_spectrum())
    # magnitude unchanged, phase rotated by the antenna phase
    np.testing.assert_allclose(np.abs(after), np.abs(before), rtol=1e-9)
    assert not np.allclose(np.angle(after[5:50]), np.angle(before[5:50]))


def test_ice_thermal_noise_adder():
    from test_vertex import _det_string
    from nuradiomc_tpu.reco.advanced import channelIceThermalNoiseAdder

    det = _det_string()
    fs, n = 2.0, 1024
    st = Station(21)
    for cid in range(4):
        ch = Channel(cid)
        ch.set_trace(np.zeros(n), fs)
        st.add_channel(ch)

    thetas = np.linspace(0, np.pi, 20)
    temps = {z: (thetas, np.full(20, 300.0))
             for z in (-60.0, -80.0, -100.0, -120.0)}
    adder = channelIceThermalNoiseAdder()
    adder.begin(temps, nr_phi_bins=8, seed=1)
    adder.run(Event(0, 0), st, det)
    rms = [float(np.std(np.asarray(st.get_channel(c).get_trace())))
           for c in range(4)]
    assert all(r > 0 for r in rms)
    # doubling the temperature doubles the noise power (RMS x sqrt(2))
    st2 = Station(21)
    for cid in range(4):
        ch = Channel(cid)
        ch.set_trace(np.zeros(n), fs)
        st2.add_channel(ch)
    adder2 = channelIceThermalNoiseAdder()
    adder2.begin({z: (thetas, np.full(20, 600.0)) for z in temps}, 
                 nr_phi_bins=8, seed=1)
    adder2.run(Event(0, 0), st2, det)
    rms2 = [float(np.std(np.asarray(st2.get_channel(c).get_trace())))
            for c in range(4)]
    np.testing.assert_allclose(np.array(rms2) / np.array(rms),
                               np.sqrt(2), rtol=1e-6)


def test_sys_uncertainties_detector():
    from test_direction import _det_four
    from nuradiomc_tpu.detector.detector import DetectorSysUncertainties

    base = _det_four()
    # reconstruct a raw dict from the same spec the helper uses
    chans = {str(c + 1): dict(base.get_channel(7, c)) for c in range(4)}
    det = DetectorSysUncertainties(
        {"channels": chans,
         "stations": {"1": {"station_id": 7, "pos_altitude": 0,
                            "pos_easting": 0, "pos_northing": 0}}})
    ori0 = np.array(det.get_antenna_orientation(7, 0))
    det.set_antenna_orientation_offsets(0.01, 0.02, 0.0, 0.0)
    ori1 = np.array(det.get_antenna_orientation(7, 0))
    np.testing.assert_allclose(ori1 - ori0, [0.01, 0.02, 0, 0], atol=1e-12)
    # channel-specific offset wins over the global one
    det.set_antenna_orientation_offsets(0.1, 0.0, 0.0, 0.0,
                                        station_id=7, channel_id=0)
    np.testing.assert_allclose(
        np.array(det.get_antenna_orientation(7, 0)) - ori0,
        [0.1, 0, 0, 0], atol=1e-12)
    # other channels keep the global offset
    np.testing.assert_allclose(
        np.array(det.get_antenna_orientation(7, 1))
        - np.array([*map(float, _det_orientation(base, 1))]),
        [0.01, 0.02, 0, 0], atol=1e-12)
    det.reset_antenna_orientation_offsets()
    np.testing.assert_allclose(det.get_antenna_orientation(7, 0), ori0)
    det.set_antenna_position_offsets(1.0, -2.0, 0.5)
    np.testing.assert_allclose(det.get_relative_position(7, 0)
                               - base.get_relative_position(7, 0),
                               [1.0, -2.0, 0.5])


def _det_orientation(det, cid):
    return det.get_antenna_orientation(7, cid)


def test_measured_noise_adder(tmp_path):
    from nuradiomc_tpu.framework.event import Channel, Event, Station
    from nuradiomc_tpu.reco.channel_processing import channelMeasuredNoiseAdder
    from nuradiomc_tpu.sim import io_nur

    rng = np.random.default_rng(0)
    path = str(tmp_path / "noise.nur")
    w = io_nur.EventWriter(path)
    for k in range(3):
        evt = Event(0, k)
        st = Station(42)
        for cid in range(2):
            ch = Channel(cid)
            ch.set_trace(rng.normal(0.5, 1.0, 512), 2.0)  # with DC baseline
            st.add_channel(ch)
        evt.set_station(st)
        w.run(evt)
    w.end()

    st = Station(42)
    for cid in range(2):
        ch = Channel(cid)
        ch.set_trace(np.zeros(256), 2.0)
        st.add_channel(ch)
    adder = channelMeasuredNoiseAdder()
    adder.begin(filenames=[path], random_seed=1)
    adder.run(Event(0, 0), st)
    tr = np.asarray(st.get_channel(0).get_trace())
    assert np.std(tr) > 0.5                     # noise actually added
    assert abs(np.mean(tr)) < 0.3               # baseline removed


def test_phased_envelope_trigger():
    import jax.numpy as jnp

    from nuradiomc_tpu.ops.phased_array import phased_envelope_trigger

    rng = np.random.default_rng(2)
    C, N = 4, 1024
    traces = rng.normal(0, 0.01, (C, N))
    # coherent pulse aligned for the zero-delay beam
    t = np.arange(N)
    pulse = 0.2 * np.exp(-0.5 * ((t - 500) / 4.0) ** 2) * np.sin(0.4 * t)
    traces += pulse
    rolls = np.array([[0, 0, 0, 0], [0, 3, 6, 9], [0, -3, -6, -9]])
    trig, first, n_trig = phased_envelope_trigger(
        jnp.asarray(traces), rolls, threshold=0.5, return_n_triggers=True)
    assert bool(trig)
    assert 480 < int(first) < 520
    assert int(n_trig) >= 1
    # noise only: no trigger at the same threshold
    trig0, _, _ = phased_envelope_trigger(
        jnp.asarray(rng.normal(0, 0.01, (C, N))), rolls, threshold=0.5)
    assert not bool(trig0)


def test_channel_time_offset_calculator():
    """Identifies the correct ray type from vertex-consistent pulse timing
    (channelTimeOffsetCalculator.py:32-163)."""
    import jax
    from test_vertex import _det_string, DEPTHS, ICE
    from nuradiomc_tpu.framework.base_trace import BaseTrace
    from nuradiomc_tpu.ops import raytrace
    from nuradiomc_tpu.reco.channel_processing import channelTimeOffsetCalculator

    stnp = par.stationParameters
    chp_ = par.channelParameters
    det = _det_string()
    vertex = np.array([500.0, 0.0, -500.0])
    fs, n = 2.0, 2048
    t = np.arange(n) / fs

    # E-field template: short band-limited pulse
    tpl = BaseTrace()
    tt = np.arange(512) / fs
    tpl.set_trace(np.exp(-0.5 * ((tt - 60) / 2.5) ** 2)
                  * np.sin(2 * np.pi * 0.25 * tt), fs)

    # channels see the DIRECT ray of a pulse from the vertex
    st = Station(21)
    times = []
    for cid, depth in enumerate(DEPTHS):
        sols = raytrace.find_solutions(0.0, vertex[2], 500.0, depth, ICE)
        tts = {int(sols.sol_type[s]): float(sols.travel_time[s])
               for s in range(2) if bool(sols.mask[s])}
        times.append(tts[1])   # direct
    t0 = np.mean(times)
    rng = np.random.default_rng(0)
    for cid, tc in enumerate(times):
        tr = np.interp(t - (tc - t0) - 300, tt, np.asarray(tpl.get_trace()),
                       left=0, right=0)
        ch = Channel(cid)
        ch.set_trace(tr + rng.normal(0, 1e-3, n), fs)
        st.add_channel(ch)
    st[stnp.nu_vertex] = vertex
    evt = Event(0, 0)
    evt.set_station(st)

    calc = channelTimeOffsetCalculator()
    calc.begin(tpl, ICE)
    ray_type = calc.run(evt, st, det, channel_ids=[0, 1, 2, 3])
    assert ray_type == "direct"
    for cid in range(4):
        assert st.get_channel(cid).has_parameter(chp_.signal_ray_type)
        assert st.get_channel(cid)[chp_.signal_ray_type] == "direct"


def test_hann_tapered_and_fir_filters():
    from nuradiomc_tpu.framework.event import Channel, Event, Station
    from nuradiomc_tpu.reco.channel_processing import (channelBandPassFilter,
                                                       half_hann_window)
    from nuradiomc_tpu.utils import units

    rng = np.random.default_rng(0)
    fs, n = 1.0, 1024
    st = Station(1)
    ch = Channel(0)
    raw = rng.normal(0, 1.0, n)
    ch.set_trace(raw.copy(), fs)
    st.add_channel(ch)
    evt = Event(0, 0)

    mod = channelBandPassFilter()
    mod.begin()
    mod.run(evt, st, None, passband=[0.1, 0.3], filter_type="hann_tapered",
            half_hann_percent=0.1)
    tr = np.asarray(ch.get_trace())
    # tapered ends are suppressed; NO band is applied — the reference's
    # hann_tapered is the time-domain window only
    # (channelBandPassFilter.py:242-246)
    assert np.max(np.abs(tr[:5])) < 0.2 * np.std(tr[300:700])
    np.testing.assert_allclose(tr, raw * half_hann_window(len(raw), 0.1),
                               rtol=0, atol=1e-12)

    # FIR filter suppresses out-of-band power in the time domain
    ch2 = Channel(1)
    t = np.arange(n) / fs
    sig = np.sin(2 * np.pi * 0.2 * t) + np.sin(2 * np.pi * 0.45 * t)
    ch2.set_trace(sig, fs)
    st2 = Station(1)
    st2.add_channel(ch2)
    mod.run(evt, st2, None, passband=[0.1, 0.3], filter_type="FIR kaiser 8",
            order=64)
    spec2 = np.abs(np.asarray(ch2.get_frequency_spectrum()))
    ff2 = np.asarray(ch2.get_frequencies())
    in_band = spec2[np.argmin(np.abs(ff2 - 0.2))]
    out_band = spec2[np.argmin(np.abs(ff2 - 0.45))]
    assert out_band < 0.01 * in_band

    w = half_hann_window(100, 0.2)
    assert w[0] < 1e-6 and np.all(w[20:80] == 1.0) and len(w) == 100


def test_cosmic_ray_energy_reconstructor():
    """Exact reference parametrization (cosmicRayEnergyReconstructor.py:41-65,
    JCAP 10 (2019) 075): hand-evaluate the formula on a synthetic efield and
    compare, and check the inside/outside-Cherenkov branch switch."""
    from nuradiomc_tpu.framework.event import ElectricField, Event, Station
    from nuradiomc_tpu.framework import parameters as par
    from nuradiomc_tpu.models.atmosphere import Atmosphere
    from nuradiomc_tpu.reco.advanced import (
        MAGNETIC_FIELD_VECTORS, cosmicRayEnergyReconstructor,
        get_angle_to_magnetic_field_vector)
    from nuradiomc_tpu.reco.rit import shower_frame
    from nuradiomc_tpu.utils.constants import Z_0
    from nuradiomc_tpu.utils.geometry import onsky_basis
    from nuradiomc_tpu.utils import units

    efp = par.electricFieldParameters
    stnp = par.stationParameters
    rng = np.random.default_rng(11)
    fs = 1.0  # GHz
    n = 512
    zenith, azimuth = np.deg2rad(55.0), np.deg2rad(230.0)

    event = Event(0, 1)
    station = Station(42)
    station[stnp.zenith] = zenith
    station[stnp.azimuth] = azimuth
    trace = np.zeros((3, n))
    tt = np.arange(n) / fs
    trace[1] = 60e-3 * np.exp(-0.5 * ((tt - 200.0) / 8.0) ** 2) \
        * np.cos(2 * np.pi * 0.15 * tt)             # eTheta pulse
    trace[2] = 25e-3 * np.exp(-0.5 * ((tt - 200.0) / 8.0) ** 2) \
        * np.sin(2 * np.pi * 0.15 * tt)             # ePhi pulse
    ef = ElectricField([0])
    ef.set_trace(trace, fs)
    slope, quad = -2.5, 0.1
    ef[efp.cr_spectrum_slope] = slope
    ef[efp.cr_spectrum_quadratic_term] = quad
    station.add_electric_field(ef)
    event.set_station(station)

    rec = cosmicRayEnergyReconstructor()
    rec.begin(site="southpole")
    energy = rec.run(event, station)
    assert energy == station[stnp.cr_energy_em]

    # hand evaluation
    alpha = get_angle_to_magnetic_field_vector(zenith, azimuth, "southpole")
    basis = np.asarray(onsky_basis(zenith, azimuth))
    ground = basis.T @ trace
    e1, e2, v = shower_frame(zenith, azimuth, MAGNETIC_FIELD_VECTORS["southpole"])
    comp = np.vstack([e1 @ ground / np.sin(alpha), e2 @ ground])
    fluence = np.sum(comp ** 2, axis=1) / fs / Z_0
    f_tot = fluence[0] + fluence[1]
    dxmax = Atmosphere().get_distance_xmax_geometric(zenith, 750.0, 2800.0)
    # quad > 0.1*slope (slope negative) -> outside-ring branch (index 1)
    scale = 643.39 * zenith ** 2 - 667.08 * zenith + 478.06
    falloff = 1.3372 * zenith - 2.1653
    expected = 1e18 * np.sqrt(f_tot) * (dxmax / units.km) \
        / (scale * np.exp(falloff * abs(slope) ** 0.8))
    np.testing.assert_allclose(energy, expected, rtol=1e-10)
    assert 1e15 < energy < 1e21

    # inside-ring branch: quadratic term below 0.1*slope
    ef[efp.cr_spectrum_quadratic_term] = slope  # <= slope*0.1
    energy_in = rec.run(event, station)
    scale0 = 976.30 * zenith ** 2 - 1213.43 * zenith + 626.98
    falloff0 = -0.2273 * zenith + 0.05627
    expected_in = 1e18 * np.sqrt(f_tot) * (dxmax / units.km) \
        / (scale0 * np.exp(falloff0 * abs(slope) ** 0.8))
    np.testing.assert_allclose(energy_in, expected_in, rtol=1e-10)
