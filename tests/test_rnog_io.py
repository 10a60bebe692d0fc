"""RNO-G raw-data access (reco/rnog_io.py): NumpyDataset backend,
readRNOGData semantics (calibration, time offsets, selectors, lookups) and
the dataProviderRNOG processing sequence — on synthetic run fixtures."""
import math
import os

import numpy as np
import pytest

from nuradiomc_tpu.framework.parameters import channelParameters as chp
from nuradiomc_tpu.reco import rnog_io
from nuradiomc_tpu.utils import units

FS = 3.2           # GHz
N_CH, N_SAMP = 24, 2048
ADC_TO_V = rnog_io.ADC_REF_VOLTAGE_RANGE / (2 ** rnog_io.ADC_N_BITS - 1)


@pytest.fixture(scope="module")
def run_dirs(tmp_path_factory):
    """Two runs of station 11: run 100 (3 events, FORCE/RADIANT0/LT),
    run 101 (2 events, FORCE; one with inf trigger time)."""
    tmp = tmp_path_factory.mktemp("rnog")
    rng = np.random.default_rng(5)

    wfs0 = rng.integers(-40, 40, (3, N_CH, N_SAMP))
    delays0 = rng.uniform(0, 10, (3, N_CH))
    rnog_io.write_numpy_dataset(
        tmp / "station11" / "run100", 11, 100, wfs0,
        event_numbers=[0, 1, 2],
        trigger_types=["FORCE", "RADIANT0", "LT"],
        trigger_times=[1.7e9, 1.7e9 + 1, 1.7e9 + 2],
        readout_times=[1.7e9, 1.7e9 + 1, 1.7e9 + 2],
        sample_rate=FS, readout_delays=delays0)

    wfs1 = rng.integers(-40, 40, (2, N_CH, N_SAMP))
    rnog_io.write_numpy_dataset(
        tmp / "station11" / "run101", 11, 101, wfs1,
        event_numbers=[0, 1],
        trigger_types=["FORCE", "FORCE"],
        trigger_times=[1.8e9, math.inf],
        readout_times=[1.8e9, 1.8e9 + 5],
        sample_rate=FS)
    return tmp, wfs0, delays0, wfs1


def _reader(run_dirs, **kwargs):
    tmp = run_dirs[0]
    r = rnog_io.readRNOGData()
    r.begin([str(tmp / "station11" / "run100"),
             str(tmp / "station11" / "run101")],
            apply_baseline_correction="none", **kwargs)
    return r


def test_reader_events_and_calibration(run_dirs):
    tmp, wfs0, delays0, wfs1 = run_dirs
    r = _reader(run_dirs)
    events = list(r.run())
    assert len(events) == 5
    assert r.get_n_events() == 5
    np.testing.assert_array_equal(r.get_run_numbers(), [100, 101])
    assert r.get_station_id(except_multiple_stations=True) == 11

    evt = events[0]
    st = evt.get_station(11)
    assert evt.get_run_number() == 100 and evt.get_id() == 0
    assert st.get_station_time() == pytest.approx(1.7e9)
    trig = st.get_first_trigger()
    assert trig.get_name() == "FORCE" and trig.has_triggered()

    # pseudo-linear voltage calibration (2.5 V / 12 bit)
    ch = st.get_channel(3)
    np.testing.assert_allclose(ch.get_trace(),
                               wfs0[0, 3] * ADC_TO_V, rtol=1e-12)
    assert ch.get_sampling_rate() == pytest.approx(FS)
    # FORCE offset 0 -> start time = -readout delay
    assert ch.get_trace_start_time() == pytest.approx(-delays0[0, 3])

    # RADIANT0 and LT offsets (readRNOGDataMattak.get_time_offset)
    ch_rad = events[1].get_station(11).get_channel(0)
    assert ch_rad.get_trace_start_time() == pytest.approx(
        -(475 * units.ns + delays0[1, 0]))
    ch_lt = events[2].get_station(11).get_channel(0)
    assert ch_lt.get_trace_start_time() == pytest.approx(
        -(250 * units.ns + delays0[2, 0]))

    # inf trigger time falls back to readout time
    assert events[4].get_station(11).get_station_time() \
        == pytest.approx(1.8e9 + 5)


def test_reader_raw_adc_and_trigger_selection(run_dirs):
    r = _reader(run_dirs, convert_to_voltage=False)
    evt = next(r.run())
    assert np.abs(np.asarray(evt.get_station(11).get_channel(0)
                             .get_trace())).max() < 50   # still ADC counts

    r2 = _reader(run_dirs, select_triggers="RADIANT")
    events = list(r2.run())
    assert len(events) == 1 and \
        events[0].get_station(11).get_first_trigger().get_name() == "RADIANT0"

    r3 = _reader(run_dirs, selectors=[lambda info: info.run == 101])
    assert len(list(r3.run())) == 2

    # inf-trigger-time events are dropped without the fallback
    r4 = _reader(run_dirs, use_fallback_time=False)
    assert len(list(r4.run())) == 4


def test_reader_lookups(run_dirs):
    r = _reader(run_dirs)
    info = r.get_events_information(keys=("run", "eventNumber",
                                         "triggerType"))
    assert len(info) == 5
    assert info[2]["triggerType"] == "LT"

    evt = r.get_event_by_index(3)       # first event of run 101
    assert evt.get_run_number() == 101 and evt.get_id() == 0
    evt2 = r.get_event(100, 2)
    assert evt2.get_run_number() == 100 and evt2.get_id() == 2
    assert r.get_event(100, 99) is None


def test_run_table_selection(run_dirs, tmp_path):
    tmp = run_dirs[0]
    table = tmp_path / "runtable.csv"
    table.write_text(
        "station,run,run_type,time_start,time_end,trigger_rate\n"
        "11,100,physics,1.6e9,1.9e9,0.5\n"
        "11,101,calibration,1.6e9,1.9e9,0.5\n")
    r = rnog_io.readRNOGData(run_table_path=str(table), load_run_table=True)
    r.begin([str(tmp / "station11" / "run100"),
             str(tmp / "station11" / "run101")],
            apply_baseline_correction="none", select_runs=True)
    np.testing.assert_array_equal(r.get_run_numbers(), [100])


def test_block_offset_removal_in_reader(tmp_path):
    """Block offsets injected into the raw ADC traces are removed by the
    reader's baseline-correction stage."""
    rng = np.random.default_rng(9)
    block = 128
    offsets = rng.normal(0, 30, (N_SAMP // block,))
    trace = rng.normal(0, 3, N_SAMP) + np.repeat(offsets, block)
    wfs = np.tile(trace, (1, N_CH, 1))
    rnog_io.write_numpy_dataset(tmp_path / "run1", 11, 1, wfs,
                                trigger_times=[1.7e9])
    r = rnog_io.readRNOGData()
    r.begin(str(tmp_path / "run1"), apply_baseline_correction="median")
    evt = next(r.run())
    out = np.asarray(evt.get_station(11).get_channel(0).get_trace())
    blocks = out.reshape(-1, block)
    # residual per-block medians are noise-level, not offset-level
    assert np.abs(np.median(blocks, axis=1)).max() < 3 * ADC_TO_V


class FakeDet:
    def __init__(self):
        self.updated_to = None

    def update(self, time):
        self.updated_to = time

    def get_cable_delay(self, station_id, channel_id):
        return 10.0 + channel_id


def test_data_provider_sequence(run_dirs):
    tmp, wfs0, delays0, _ = run_dirs
    det = FakeDet()
    provider = rnog_io.dataProviderRNOG()
    provider.begin([str(tmp / "station11" / "run100")], det)
    events = list(provider.run())
    assert len(events) == 3
    # detector followed the station time of the last event
    assert det.updated_to == pytest.approx(1.7e9 + 2)
    st = events[0].get_station(11)
    ch = st.get_channel(2)
    # glitch flag was set by the detector stage
    assert ch.has_parameter(chp.glitch)
    # block offsets were fitted and recorded
    assert ch.has_parameter(chp.block_offsets)
    # cable delay subtracted on top of the readout-delay start time
    assert ch.get_trace_start_time() == pytest.approx(
        -delays0[0, 2] - (10.0 + 2))
    provider.end()
