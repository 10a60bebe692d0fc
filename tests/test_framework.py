"""Framework data-model tests: BaseTrace semantics and .nur-style round trip."""
import numpy as np

from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.base_trace import BaseTrace
from nuradiomc_tpu.framework.event import (Channel, ElectricField, Event,
                                           SimChannel, SimStation, Shower,
                                           Station, Trigger)
from nuradiomc_tpu.sim import io_nur


def test_base_trace_lazy_roundtrip():
    rng = np.random.default_rng(1)
    tr = rng.normal(size=256)
    bt = BaseTrace(tr, 2.0, trace_start_time=10.0)
    spec = bt.get_frequency_spectrum()
    np.testing.assert_allclose(bt.get_trace(), tr, atol=1e-12)
    assert spec.shape == (129,)
    assert bt.get_times()[0] == 10.0


def test_time_shift_is_subbin_accurate():
    fs = 2.0
    t = np.arange(512) / fs
    tr = np.exp(-0.5 * ((t - 100) / 5) ** 2)
    bt = BaseTrace(tr, fs)
    bt.apply_time_shift(0.25)  # half a bin
    bt.apply_time_shift(-0.25)
    np.testing.assert_allclose(bt.get_trace(), tr, atol=1e-9)


def test_add_to_trace_alignment():
    fs = 1.0
    base = BaseTrace(np.zeros(128), fs, trace_start_time=0.0)
    pulse = np.zeros(32)
    pulse[16] = 1.0
    short = BaseTrace(pulse, fs, trace_start_time=40.0)
    base.add_to_trace(short)
    assert np.argmax(base.get_trace()) == 56  # 40 + 16


def test_resample_preserves_shape_content():
    fs = 2.0
    t = np.arange(256) / fs
    tr = np.sin(2 * np.pi * 0.1 * t)
    bt = BaseTrace(tr, fs)
    bt.resample(4.0)
    assert bt.get_number_of_samples() == 512
    bt.resample(2.0)
    np.testing.assert_allclose(bt.get_trace(), tr, atol=1e-9)


def test_nur_roundtrip(tmp_path):
    evt = Event(1, 42)
    st = Station(101)
    ch = Channel(0)
    ch.set_trace(np.arange(64, dtype=float), 2.0, trace_start_time=5.0)
    ch[par.channelParameters.maximum_amplitude] = 63.0
    st.add_channel(ch)
    ef = ElectricField([0], position=np.array([1.0, 2.0, -3.0]),
                       shower_id=7, ray_tracing_id=1)
    ef.set_trace(np.zeros((3, 64)), 2.0)
    ef[par.electricFieldParameters.nu_viewing_angle] = 0.95
    st.add_electric_field(ef)
    trig = Trigger("hl", [0], "high_low")
    trig.set_triggered(True)
    trig.set_trigger_time(123.4)
    st.set_trigger(trig)

    ss = SimStation(101)
    sc = SimChannel(0, 7, 1)
    sc.set_trace(np.ones(64), 2.0)
    ss.add_channel(sc)
    st.set_sim_station(ss)
    evt.set_station(st)

    sh = Shower(7)
    sh[par.showerParameters.energy] = 1e18
    sh[par.showerParameters.zenith] = 1.2
    sh[par.showerParameters.azimuth] = 0.3
    evt.add_sim_shower(sh)

    path = str(tmp_path / "test.nur")
    w = io_nur.EventWriter(path)
    w.run(evt)
    w.end()

    r = io_nur.EventReader(path)
    events = list(r.get_events())
    r.end()
    assert len(events) == 1
    e2 = events[0]
    assert e2.get_id() == 42
    st2 = e2.get_station(101)
    np.testing.assert_allclose(st2.get_channel(0).get_trace(),
                               np.arange(64, dtype=float))
    assert st2.get_channel(0)[par.channelParameters.maximum_amplitude] == 63.0
    assert st2.has_triggered()
    assert st2.get_trigger("hl").get_trigger_time() == 123.4
    ef2 = st2.get_electric_fields()[0]
    assert ef2.get_shower_id() == 7
    assert e2.get_sim_shower(7)[par.showerParameters.energy] == 1e18
    sc2 = next(st2.get_sim_station().iter_channels())
    assert sc2.get_unique_identifier() == (0, 7, 1)
    axis = e2.get_sim_shower(7).get_axis()
    assert abs(np.linalg.norm(axis) - 1) < 1e-12
