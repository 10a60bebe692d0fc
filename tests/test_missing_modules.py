"""Tests for the per-efield / per-channel-group converters and the efield
galactic noise adder (reference modules efieldToVoltageConverterPerEfield.py,
voltageToEfieldConverterPerChannelGroup.py, efieldGalacticNoiseAdder.py)."""
import numpy as np
import pytest

from nuradiomc_tpu.detector.detector import Detector
from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.event import ElectricField, Event, SimStation, Station
from nuradiomc_tpu.reco import advanced
from nuradiomc_tpu.reco import efield_converters as ec
from nuradiomc_tpu.utils import units

efp = par.electricFieldParameters
stnp = par.stationParameters


def _detector(group_ids=False):
    def ch(cid, ant, z=-10.0):
        d = {
            "adc_n_samples": 256, "adc_sampling_frequency": 1.0,
            "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
            "ant_position_x": 0.0, "ant_position_y": 0.0, "ant_position_z": z,
            "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
            "ant_type": ant, "amp_type": "", "cab_time_delay": 0.0,
            "adc_nbits": None, "channel_id": cid, "station_id": 42,
        }
        if group_ids:
            d["channel_group_id"] = 7        # both antennas in one structure
        return d
    return Detector({
        "channels": {"1": ch(0, "analytic_VPol"), "2": ch(1, "analytic_HPol")},
        "stations": {"1": {"pos_altitude": 0, "pos_easting": 0, "pos_northing": 0,
                           "station_id": 42, "pos_site": "southpole"}},
    })


def _pulse_spec(ff):
    spec = np.zeros((3, len(ff)), dtype=complex)
    band = (ff > 0.15) & (ff < 0.45)
    spec[1, band] = np.exp(-((ff[band] - 0.25) / 0.1) ** 2) \
        * np.exp(2j * np.pi * ff[band] * 30)
    spec[2, band] = 0.5 * np.exp(-((ff[band] - 0.3) / 0.08) ** 2) \
        * np.exp(2j * np.pi * ff[band] * 28)
    return spec


def _event(det, n_efields=1):
    evt = Event(0, 0)
    station = Station(42)
    sim = SimStation(42)
    fs, N = 2.0, 512
    ff = np.fft.rfftfreq(N, 1 / fs)
    zenith, azimuth = np.deg2rad(70.0), np.deg2rad(30.0)
    specs = []
    for k in range(n_efields):
        spec = _pulse_spec(ff) * (1.0 + 0.5 * k)
        ef = ElectricField([0, 1], position=np.zeros(3), shower_id=k,
                           ray_tracing_id=0)
        ef.set_frequency_spectrum(spec, fs)
        ef.set_trace_start_time(100.0 + 20.0 * k)
        ef[efp.zenith] = zenith
        ef[efp.azimuth] = azimuth
        sim.add_electric_field(ef)
        specs.append(spec)
    station.set_sim_station(sim)
    station[stnp.zenith] = zenith
    station[stnp.azimuth] = azimuth
    sim[stnp.zenith] = zenith
    sim[stnp.azimuth] = azimuth
    evt.set_station(station)
    return evt, station, (ff, fs, zenith, azimuth, specs)


def test_per_efield_converter_makes_one_simchannel_per_efield():
    det = _detector()
    evt, station, (ff, fs, zenith, azimuth, specs) = _event(det, n_efields=2)

    conv = ec.efieldToVoltageConverterPerEfield()
    conv.begin()
    conv.run(evt, station, det)

    sim = station.get_sim_station()
    sim_channels = list(sim.iter_channels())
    assert len(sim_channels) == 4        # 2 channels x 2 efields

    # each SimChannel must equal VEL . E of exactly its own efield
    for sc in sim_channels:
        cid = sc.get_id()
        k = sc.get_shower_id()
        vt, vp = ec.get_channel_vel(det, 42, cid, ff, zenith, azimuth)
        expect = vt * specs[k][1] + vp * specs[k][2]
        expect[ff < 5 * units.MHz] = 0
        np.testing.assert_allclose(np.asarray(sc.get_frequency_spectrum()),
                                   expect, atol=1e-12)
        # displaced antenna (efield at origin, antenna at z=-10) gets the
        # cosmic-ray plane-wave delay on top of the efield start time
        from nuradiomc_tpu.reco.direction import get_time_delay_from_direction
        shift = get_time_delay_from_direction(
            zenith, azimuth, det.get_relative_position(42, cid), n=1.000293)
        assert sc.get_trace_start_time() == pytest.approx(
            100.0 + 20.0 * k + shift)


def test_per_efield_requires_efields():
    det = _detector()
    evt = Event(0, 0)
    station = Station(42)
    station.set_sim_station(SimStation(42))
    conv = ec.efieldToVoltageConverterPerEfield()
    conv.begin()
    with pytest.raises(LookupError):
        conv.run(evt, station, det)


def test_per_channel_group_unfold_roundtrip():
    det = _detector(group_ids=True)
    assert det.get_channel_group_id(42, 0) == 7
    assert det.get_channel_group_id(42, 1) == 7
    evt, station, (ff_in, fs, zenith, azimuth, specs) = _event(det)

    fold = ec.efieldToVoltageConverter()
    fold.begin()
    fold.run(evt, station, det)

    unfold = ec.voltageToEfieldConverterPerChannelGroup()
    unfold.begin()
    unfold.run(evt, station, det)

    recs = station.get_electric_fields()
    assert len(recs) == 1                 # one group -> one efield
    rec = recs[0]
    assert sorted(rec.get_channel_ids()) == [0, 1]
    spec_out = np.asarray(rec.get_frequency_spectrum())
    ff_out = rec.get_frequencies()
    band = (ff_in > 0.18) & (ff_in < 0.42)
    for pol in (1, 2):
        a = np.abs(specs[0][pol][band])
        b = np.interp(ff_in[band], ff_out, np.abs(spec_out[pol]))
        rel = np.linalg.norm(b - a) / np.linalg.norm(a)
        assert rel < 0.03, rel


def test_per_channel_group_no_groups_is_per_channel():
    det = _detector(group_ids=False)
    groups = ec.select_channels_per_station(det, 42, [0, 1])
    assert groups == {0: [0], 1: [1]}


def test_efield_galactic_noise_adder():
    det = _detector()
    evt, station, (ff, fs, zenith, azimuth, specs) = _event(det, n_efields=2)
    sim = station.get_sim_station()

    before = [np.array(ef.get_frequency_spectrum())
              for ef in sim.get_electric_fields()]

    adder = advanced.efieldGalacticNoiseAdder()
    adder.begin(n_pixels=48, seed=3)
    adder.run(evt, sim, det, passband=[30 * units.MHz, 300 * units.MHz])

    band = (ff > 30 * units.MHz) & (ff < 300 * units.MHz)
    for ef, b4 in zip(sim.get_electric_fields(), before):
        after = np.asarray(ef.get_frequency_spectrum())
        # R component untouched, noise added on-sky only
        np.testing.assert_array_equal(after[0], b4[0])
        for pol in (1, 2):
            diff = after[pol] - b4[pol]
            assert np.max(np.abs(diff[band])) > 0
            np.testing.assert_array_equal(diff[~band], 0)

    # deterministic under the same seed
    evt2, station2, _ = _event(det, n_efields=2)
    sim2 = station2.get_sim_station()
    adder2 = advanced.efieldGalacticNoiseAdder()
    adder2.begin(n_pixels=48, seed=3)
    adder2.run(evt2, sim2, det, passband=[30 * units.MHz, 300 * units.MHz])
    np.testing.assert_allclose(
        np.asarray(sim2.get_electric_fields()[0].get_frequency_spectrum()),
        np.asarray(sim.get_electric_fields()[0].get_frequency_spectrum()))


def test_ska_detector():
    from nuradiomc_tpu.detector.ska import SKADetector

    det = SKADetector()
    det.add_station_position(0, [0.0, 0.0, 460.0])
    for aid, (x, y) in enumerate([(0, 0), (1.5, 0), (0, 1.5)]):
        det.add_antenna_position(0, aid, [x, y, 0.0])

    assert det.get_station_ids() == [0]
    cids = det.get_channel_ids(0)
    assert cids == [0, 1, 10, 11, 20, 21]          # antenna_id*10 + pol
    assert det.get_channel_group_id(0, 21) == 2
    np.testing.assert_array_equal(det.get_relative_position(0, 10),
                                  [1.5, 0.0, 0.0])
    np.testing.assert_array_equal(det.get_relative_position(0, 11),
                                  [1.5, 0.0, 0.0])   # same antenna
    assert det.get_antenna_model(0, 0) == "SKALA_v4_Xpol"
    # the two polarizations differ by a 90 deg antenna rotation
    o0 = det.get_antenna_orientation(0, 0)
    o1 = det.get_antenna_orientation(0, 1)
    assert o0[3] != o1[3]
    assert det.get_site(0) == "ska"
    assert det.get_number_of_samples(0, 0) == 1024
    assert det.get_sampling_frequency(0, 0) == 0.8
    groups = ec.select_channels_per_station(det, 0, cids)
    assert groups == {0: [0, 1], 1: [10, 11], 2: [20, 21]}


def test_hybrid_information():
    from nuradiomc_tpu.framework.event import (Event, HybridInformation,
                                               HybridShower)
    from nuradiomc_tpu.framework.parameters import showerParameters as shp

    evt = Event(0, 1)
    hi = evt.get_hybrid_information()
    assert isinstance(hi, HybridInformation)
    sh = HybridShower("companion")
    sh[shp.energy] = 1e17
    hi.add_hybrid_shower(sh)
    assert hi.get_hybrid_shower("companion")[shp.energy] == 1e17
    assert [s.get_name() for s in hi.get_hybrid_showers()] == ["companion"]
    with pytest.raises(ValueError):
        hi.add_hybrid_shower(HybridShower("companion"))
    sh.set_hybrid_detector("det-handle")
    assert sh.get_hybrid_detector() == "det-handle"


def test_detector_time_dependent_update():
    import datetime

    def ch(cid, t0, t1):
        return {"adc_n_samples": 256, "adc_sampling_frequency": 1.0,
                "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
                "ant_position_x": 0.0, "ant_position_y": 0.0,
                "ant_position_z": -10.0, "ant_rotation_phi": 90.0,
                "ant_rotation_theta": 90.0, "ant_type": "analytic_VPol",
                "amp_type": "", "cab_time_delay": 0.0, "adc_nbits": None,
                "channel_id": cid, "station_id": 7,
                "commission_time": f"{{TinyDate}}:{t0}",
                "decommission_time": f"{{TinyDate}}:{t1}"}

    det = Detector({
        "channels": {"1": ch(0, "2015-01-01T00:00:00", "2038-01-01T00:00:00"),
                     "2": ch(1, "2020-06-01T00:00:00", "2038-01-01T00:00:00")},
        "stations": {"1": {"pos_altitude": 0, "pos_easting": 0,
                           "pos_northing": 0, "station_id": 7,
                           "commission_time": "{TinyDate}:2015-01-01T00:00:00",
                           "decommission_time": "{TinyDate}:2038-01-01T00:00:00"}},
    })
    assert det.get_channel_ids(7) == [0, 1]       # no time set: everything
    det.update(datetime.datetime(2018, 10, 1))
    assert det.get_channel_ids(7) == [0]          # channel 1 not yet built
    det.update(datetime.datetime(2021, 1, 1))
    assert det.get_channel_ids(7) == [0, 1]
    det.update(datetime.datetime(2039, 1, 1))
    assert det.get_station_ids() == []            # station decommissioned
