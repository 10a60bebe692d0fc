"""ARA (araroot) and ARIANNA (snowshovel) raw-reader semantics on the
numpy-export backend — the same synthetic-fixture trick as the LOFAR TBB
and RNO-G readers (the ROOT-based backends are import-gated).

Reference semantics under test: readARAData.py:95-121 (uniform re-grid +
even trim), readARIANNAData.py:37-68, readARIANNADataCalib.py:104-241
(selection filters, config matching + skip counters, stop roll, ARIANNA
station parameters)."""

import datetime

import numpy as np
import pytest

from nuradiomc_tpu.framework.parameters import ARIANNAParameters as ARIpar
from nuradiomc_tpu.reco import ara_io, arianna_io
from nuradiomc_tpu.utils import units


# ---------------------------------------------------------------- ARA ----

def _ara_fixture(tmp_path, n_events=3, n_channels=4):
    rng = np.random.RandomState(7)
    times, volts = [], []
    for _ in range(n_events):
        ev_t, ev_v = [], []
        for c in range(n_channels):
            n = 40 + rng.randint(0, 8)
            # slightly non-uniform sample times, as the calibrated ARA
            # graphs are
            t = np.cumsum(0.55 + 0.15 * rng.rand(n))
            ev_t.append(t)
            ev_v.append(rng.randn(n) * 50.0)      # mV
        times.append(ev_t)
        volts.append(ev_v)
    path = tmp_path / "ara_run42.npz"
    ara_io.write_numpy_dataset(path, 42, [2] * n_events,
                               np.arange(100, 100 + n_events), times, volts)
    return path, times, volts


def test_ara_reader_regrid_and_assembly(tmp_path):
    path, times, volts = _ara_fixture(tmp_path)
    reader = ara_io.readARAData()
    n = reader.begin(str(path))
    assert n == 3

    events = list(reader.run(n_channels=4))
    assert len(events) == 3
    for i, evt in enumerate(events):
        assert evt.get_run_number() == 42
        assert evt.get_id() == 100 + i
        station = evt.get_station(2)
        chans = list(station.iter_channels())
        assert len(chans) == 4
        for c, ch in enumerate(chans):
            t, v = times[i][c], np.asarray(volts[i][c]) * units.mV
            t_new = np.arange(t[0], t[-1], 0.625 * units.ns)
            expect = np.interp(t_new, t, v)
            if expect.size % 2:
                expect = expect[:-1]
            got = ch.get_trace()
            assert got.size % 2 == 0
            np.testing.assert_allclose(got, expect, rtol=0, atol=1e-12)
            # actual rate (NOT the reference's period/rate swap,
            # ara_io module docstring)
            assert ch.get_sampling_rate() == pytest.approx(1.0 / 0.625)
    reader.end()


# ------------------------------------------------------------ ARIANNA ----

def _arianna_fixture(tmp_path, stop_missing_event=2, custom_cfg_event=None):
    """5 events over 2 sequences; event 2 has no stop sample; event 3 is
    forced (not thermal); event 4 belongs to a sequence with no config."""
    n_ch, n_s = 4, 256
    rng = np.random.RandomState(3)
    wf = rng.randn(5, n_ch, n_s) * 20.0
    t0 = datetime.datetime(2018, 3, 1, 12, 0, 0).timestamp()
    blocks = dict(
        station_ids=[51, 51, 51, 51, 51],
        run_numbers=[7, 7, 7, 7, 7],
        event_numbers=[10, 11, 12, 13, 14],
        seq_numbers=[1, 1, 1, 2, 3],        # seq 3 has no config row
        unix_times=t0 + np.arange(5) * 60.0,
        is_thermal=[True, False, True, False, True],
        is_forced=[False, True, False, True, False],
        dt_ms=[5.0, 6.0, 7.0, 8.0, 9.0],
        stop_samples=[17, 33, -1, 5, 12],
        cfg_station_ids=[51, 51],
        cfg_run_numbers=[7, 7],
        cfg_seq_numbers=[1, 2],
        cfg_n_chans=[n_ch, n_ch],
        cfg_sampling_rates=[1.0, 1.0],
        cfg_type_names=["Standard",
                        "Custom" if custom_cfg_event else "Standard"],
        cfg_seq_start=[t0 - 30.0, 0.0],     # second sequence: unset sentinel
        cfg_seq_stop=[t0 + 600.0, 0.0],
        cfg_comm_durations=[120.0, 120.0],
        cfg_comm_periods=[600.0, 600.0],
        cfg_l1_cuts=[0.3, 0.3],
        cfg_thresholds=np.tile(np.array([[-0.1, 0.1]]), (2, n_ch, 1)),
    )
    path = tmp_path / "arianna.npz"
    arianna_io.write_numpy_dataset(path, trees={"AmpOutData": wf}, **blocks)
    return path, wf, blocks


def test_arianna_calib_reader_full_semantics(tmp_path):
    path, wf, blocks = _arianna_fixture(tmp_path)
    reader = arianna_io.readARIANNADataCalib()
    n = reader.begin(str(path))
    assert n == 5

    events = list(reader.run())
    # event 2 dropped (no stop), event 4 dropped (no config row)
    assert [e.get_id() for e in events] == [10, 11, 13]
    assert reader.skipped_events == 1          # missing config
    assert reader.skipped_events_stop == 1     # missing stop
    reader.end()

    evt = events[0]
    station = evt.get_station(51)
    assert station.has_triggered()             # thermal
    # stop roll (readARIANNADataCalib.py:192-200)
    np.testing.assert_allclose(
        list(station.iter_channels())[1].get_trace(),
        np.roll(wf[0, 1] * units.mV, -17), atol=0)
    assert station.get_parameter(ARIpar.seq_num) == 1
    assert station.get_parameter(ARIpar.seq_start_time) == \
        datetime.datetime.fromtimestamp(blocks["cfg_seq_start"][0])
    assert station.get_parameter(ARIpar.comm_duration) == \
        pytest.approx(120.0 * units.s)
    assert station.get_parameter(ARIpar.internal_clock_time) == \
        pytest.approx(5.0 * units.ms)
    thr = station.get_parameter(ARIpar.trigger_thresholds)
    assert thr[2] == {"low": -0.1, "high": 0.1}

    # sequence-2 event: pre-1971 sentinel -> None seq times
    evt13 = events[2]
    st13 = evt13.get_station(51)
    assert st13.get_parameter(ARIpar.seq_start_time) is None
    assert st13.get_parameter(ARIpar.seq_stop_time) is None
    assert not st13.has_triggered()            # forced, not thermal


def test_arianna_calib_selection_filters(tmp_path):
    path, wf, blocks = _arianna_fixture(tmp_path)

    r = arianna_io.readARIANNADataCalib()
    r.begin(str(path), trigger_types=["forced"])
    assert [e.get_id() for e in r.run()] == [11, 13]

    r = arianna_io.readARIANNADataCalib()
    r.begin(str(path), event_ids={7: [11]})
    assert [e.get_id() for e in r.run()] == [11]

    r = arianna_io.readARIANNADataCalib()
    r.begin(str(path), run_number=8)
    assert [e.get_id() for e in r.run()] == []

    t0 = datetime.datetime.fromtimestamp(float(blocks["unix_times"][1]))
    r = arianna_io.readARIANNADataCalib()
    r.begin(str(path), time_interval=[t0, t0 + datetime.timedelta(hours=1)])
    assert 10 not in [e.get_id() for e in r.run()]


def test_arianna_basic_reader(tmp_path):
    path, wf, blocks = _arianna_fixture(tmp_path)
    reader = arianna_io.readARIANNAData()
    n = reader.begin(str(path), station_id=51)
    assert n == 5
    events = list(reader.run())
    assert len(events) == 5                    # basic reader: no skipping
    ch0 = list(events[0].get_station(51).iter_channels())[0]
    # no stop roll in the basic reader (readARIANNAData.py:60-66)
    np.testing.assert_allclose(ch0.get_trace(), wf[0, 0] * units.mV, atol=0)
    assert ch0.get_sampling_rate() == pytest.approx(1.0 * units.GHz)


def test_root_backends_are_import_gated(tmp_path):
    with pytest.raises(ImportError, match="AraRoot"):
        ara_io.readARAData().begin("/nonexistent/run.root")
    with pytest.raises(ImportError, match="snowshovel"):
        arianna_io.readARIANNADataCalib().begin("/nonexistent/file.root")
