"""LOFAR TBB raw reader (reco/lofar_tbb.py): synthetic TBB-format HDF5
fixtures (the CoREAS trick) exercising the format layer (single/multi file,
pairing, alignment, flips, delays), the LORA windowing math, and the full
raw-file -> readLOFARData -> pulse-find -> direction-fit chain."""
import json
import os

import h5py
import numpy as np
import pytest

from nuradiomc_tpu.framework.parameters import (channelParameters,
                                                showerParameters,
                                                stationParameters)
from nuradiomc_tpu.reco import lofar, lofar_tbb
from nuradiomc_tpu.utils import units

FS_HZ = 200e6          # LOFAR LBA clock
FS = 0.2               # same in internal GHz units


# ---------------------------------------------------------------------------
# fixture writer: the TBB DAL1 layout (see lofar_tbb.py module docstring)
# ---------------------------------------------------------------------------

def _local_to_itrf(local_positions):
    """Invert lofar_tbb.convert_itrf_to_local (the rotation is orthonormal)."""
    basis = lofar_tbb.convert_itrf_to_local(
        lofar_tbb.CS002_ITRF + np.eye(3))    # rows: images of ITRF axes
    return lofar_tbb.CS002_ITRF + np.asarray(local_positions) @ np.linalg.inv(basis)


def write_tbb(path, dipoles, station_id=2, time_s=1270000000,
              antenna_set=b"LBA_OUTER", fs_value=200.0, fs_unit=b"MHz",
              with_metadata=True):
    """``dipoles``: dict name -> (trace int16, sample_number, cal_delay_s,
    local_position[3])."""
    name = lofar_tbb.SID_TO_SNAME[station_id]
    with h5py.File(path, "w") as f:
        f.attrs["ANTENNA_SET"] = np.array([antenna_set])
        f.attrs["FILTER_SELECTION"] = np.array([b"LBA_10_90"])
        grp = f.create_group(f"Station{name}")
        for dip, (trace, sn, delay, pos) in dipoles.items():
            ds = grp.create_dataset(dip, data=np.asarray(trace, np.int16))
            ds.attrs["STATION_ID"] = np.array([station_id])
            ds.attrs["SAMPLE_FREQUENCY_VALUE"] = np.array([fs_value])
            ds.attrs["SAMPLE_FREQUENCY_UNIT"] = np.array([fs_unit])
            ds.attrs["TIME"] = np.array([time_s])
            ds.attrs["SAMPLE_NUMBER"] = np.array([sn])
            ds.attrs["DATA_LENGTH"] = np.array([len(trace)])
            if with_metadata:
                ds.attrs["ANTENNA_POSITION_VALUE"] = _local_to_itrf(pos)
                ds.attrs["DIPOLE_CALIBRATION_DELAY_VALUE"] = np.array([delay])
    return path


def _name(station_id, rcu):
    return f"{station_id:03d}000{rcu:03d}"


# ---------------------------------------------------------------------------
# format layer
# ---------------------------------------------------------------------------

def test_single_file_attrs_and_alignment(tmp_path):
    rng = np.random.default_rng(0)
    tr0 = rng.integers(-100, 100, 1000).astype(np.int16)
    tr1 = rng.integers(-100, 100, 1000).astype(np.int16)
    # dipole 1 starts 7 samples later: its sample 0 is absolute sample 207
    dip = {_name(2, 0): (tr0, 200, 1e-9, [1.0, 2.0, 3.0]),
           _name(2, 1): (tr1, 207, 2e-9, [1.0, 2.0, 3.0])}
    f = lofar_tbb.TBBFile(write_tbb(tmp_path / "a.h5", dip))
    assert f.station_name == "CS002" and f.station_id == 2
    assert f.antenna_set == "LBA_OUTER"
    assert f.sample_frequency == pytest.approx(FS_HZ)
    assert f.nominal_sample_number == 207
    np.testing.assert_array_equal(f.sample_offsets, [7, 0])
    # aligned reads: index 0 of both dipoles is absolute sample 207
    np.testing.assert_array_equal(
        f.get_data(0, 10, antenna_ID=_name(2, 0)), tr0[7:17])
    np.testing.assert_array_equal(
        f.get_data(0, 10, antenna_index=1), tr1[:10])
    with pytest.raises(IndexError):
        f.get_data(990, 10, antenna_index=0)
    f.close()


def test_multifile_pairing_bad_antennas_and_flips(tmp_path):
    rng = np.random.default_rng(1)

    def tr(k):
        return (k * np.ones(100)).astype(np.int16)

    pos = [0.0, 0.0, 0.0]
    # file A: even dipoles 0,2,4; file B: odd dipoles 1,3 (5 missing), 7 (6 missing)
    write_tbb(tmp_path / "a.h5", {_name(2, 0): (tr(1), 10, 0.0, pos),
                                  _name(2, 2): (tr(2), 10, 0.0, pos),
                                  _name(2, 4): (tr(3), 10, 0.0, pos)})
    write_tbb(tmp_path / "b.h5", {_name(2, 1): (tr(4), 10, 0.0, pos),
                                  _name(2, 3): (tr(5), 10, 0.0, pos),
                                  _name(2, 7): (tr(6), 10, 0.0, pos)})
    st = lofar_tbb.TBBStation([str(tmp_path / "a.h5"), str(tmp_path / "b.h5")])
    # only complete pairs: (0,1) and (2,3); 4 lacks odd, 7 lacks even
    assert st.get_antenna_names() == [_name(2, 0), _name(2, 1),
                                      _name(2, 2), _name(2, 3)]

    # bad even antenna 0 kills the whole pair under only_complete_pairs
    st2 = lofar_tbb.TBBStation(
        [str(tmp_path / "a.h5"), str(tmp_path / "b.h5")],
        bad_antennas=[(_name(2, 0), 0)])
    assert st2.get_antenna_names() == [_name(2, 2), _name(2, 3)]

    # incomplete pairs kept when asked; missing partner has no data
    st3 = lofar_tbb.TBBStation(
        [str(tmp_path / "a.h5"), str(tmp_path / "b.h5")],
        only_complete_pairs=False)
    assert _name(2, 4) in st3.get_antenna_names()
    assert _name(2, 5) in st3.get_antenna_names()
    assert st3.has_antenna(_name(2, 4)) and not st3.has_antenna(_name(2, 5))
    assert st3.has_antenna(_name(2, 7)) and not st3.has_antenna(_name(2, 6))
    with pytest.raises(LookupError):
        st3.get_data(0, 5, antenna_ID=_name(2, 5))
    _, ok = st3.get_all_data(0, 5)
    assert ok.sum() == 6 and len(ok) == 8

    # polarization flip: even/odd data locations swap
    st4 = lofar_tbb.TBBStation(
        [str(tmp_path / "a.h5"), str(tmp_path / "b.h5")],
        polarization_flips=[_name(2, 0)])
    np.testing.assert_array_equal(
        st4.get_data(0, 5, antenna_ID=_name(2, 0)), 4 * np.ones(5))
    np.testing.assert_array_equal(
        st4.get_data(0, 5, antenna_ID=_name(2, 1)), 1 * np.ones(5))


def test_delays_and_positions(tmp_path):
    pos_e = [10.0, -20.0, 0.5]
    pos_o = [10.0, -20.0, 0.5]
    dip = {_name(2, 0): (np.zeros(50, np.int16), 0, 3e-9, pos_e),
           _name(2, 1): (np.zeros(50, np.int16), 0, 5e-9, pos_o)}
    st = lofar_tbb.TBBStation(str(write_tbb(tmp_path / "a.h5", dip)),
                              additional_ant_delays={_name(2, 0): (1e-9, 2e-9)},
                              station_delay=7e-9)
    np.testing.assert_allclose(st.get_timing_calibration_delays(),
                               [4e-9, 7e-9])
    st.set_odd_polarization_delay(0.5e-9)
    np.testing.assert_allclose(st.get_timing_calibration_delays(),
                               [4e-9, 7.5e-9])
    np.testing.assert_allclose(
        st.get_total_delays(),
        np.array([4e-9, 7.5e-9]) + 7e-9 - st.nominal_sample_number / FS_HZ)
    # round-trip ITRF -> local recovers the construction positions
    np.testing.assert_allclose(st.get_lofar_centered_positions(),
                               [pos_e, pos_o], atol=1e-6)
    # geometric delay of a source 1 km overhead of the array plane
    d = st.get_geometric_delays([10.0, -20.0, 1000.5])
    np.testing.assert_allclose(d, 1000.0 / lofar_tbb.V_AIR, rtol=1e-12)


def test_correction_file_parsers(tmp_path):
    f1 = tmp_path / "flips.txt"
    f1.write_text("002000000\n002000004\n")
    assert lofar_tbb.read_antenna_pol_flips(f1) == ["002000000", "002000004"]
    f2 = tmp_path / "bad.txt"
    f2.write_text("002000000 1\n002000002 0\n")
    assert lofar_tbb.read_bad_antennas(f2) == [("002000000", 1),
                                               ("002000002", 0)]
    f3 = tmp_path / "bad2.txt"
    f3.write_text("version 2\n002000001\n002000002\n")
    assert lofar_tbb.read_bad_antennas(f3) == [("002000000", 1),
                                               ("002000002", 0)]
    f4 = tmp_path / "delays.txt"
    f4.write_text("002000000 1.5e-9 2.5e-9\n")
    assert lofar_tbb.read_antenna_delays(f4) == {
        "002000000": (1.5e-9, 2.5e-9)}
    f5 = tmp_path / "stations.txt"
    f5.write_text("CS002 8.3e-6\nCS003 6.9e-6\n")
    assert lofar_tbb.read_station_delays(f5)["CS003"] == 6.9e-6


def test_clock_corrections_and_id_helpers():
    cc = lofar_tbb.get_clock_corrections("LBA", time=1262304000)
    assert cc["CS002"] == pytest.approx(8.32233e-06)
    assert cc["CS007"] == pytest.approx(7.916458e-06 - 0.22e-9)
    cc_hba = lofar_tbb.get_clock_corrections("HBA")
    assert cc_hba["CS501"] == pytest.approx(1.65842e-05)

    assert lofar_tbb.tbbid_to_nrrid("002000013", "LBA_outer") == "002000013"
    assert lofar_tbb.tbbid_to_nrrid("002000013", "LBA_INNER") == "002900013"
    assert lofar_tbb.nrrid_to_tbbid("002900013") == "002000013"
    assert lofar_tbb.nrrid_to_tbbid(2900013) == "002000013"
    assert lofar_tbb.lofar_event_id_to_unix(0) == 1262304000
    # tag format: 2010-01-01T00:00:00 UTC
    assert lofar_tbb.tbb_filetag_from_unix(1262304000) == "D20100101T000000"
    assert lofar_tbb.SNAME_TO_SID["CS302"] == 142


def test_lora_blocknumber_math():
    # trigger exactly at sample 10000 past nominal start, no clock offset:
    # lora_ns * 0.2 samples/ns = sample_number + 10000
    block, in_block = lofar_tbb.lora_timestamp_to_blocknumber(
        100, (500 + 10000) / 0.2, 100, 500, clock_offset=0.0,
        block_size=4096)
    assert (block, in_block) == (10000 // 4096, 10000 % 4096)
    with pytest.raises(ValueError):
        lofar_tbb.lora_timestamp_to_blocknumber(
            100, 0.0, 101, 500, clock_offset=0.0, block_size=4096)


# ---------------------------------------------------------------------------
# end-to-end: TBB files + LORA json -> Event -> pulse find -> direction fit
# ---------------------------------------------------------------------------

ZEN_TRUE = np.deg2rad(35.0)
AZI_TRUE = np.deg2rad(120.0)


class FakeTBBDetector:
    """Detector keyed by NRR channel ids (station CS002 -> 2000000...)."""

    def __init__(self, local_positions):
        self.positions = {}          # nrr id -> local position
        for ant, pos in enumerate(local_positions):
            for pol in range(2):
                self.positions[2000000 + 2 * ant + pol] = np.asarray(pos)

    def get_channel_group_id(self, station_id, channel_id):
        return channel_id - channel_id % 2

    def get_relative_position(self, station_id, channel_id):
        return self.positions[channel_id]

    def get_antenna_orientation(self, station_id, channel_id):
        phi = 135.0 if channel_id % 2 == 0 else 225.0
        return np.deg2rad([90.0, phi, 90.0, phi + 90.0])

    def get_number_of_channels(self, station_id):
        return len(self.positions)

    def get_site_coordinates(self, station_id=None):
        return 52.91, 6.87


@pytest.fixture(scope="module")
def tbb_event_dir(tmp_path_factory):
    """One CS002 station: 16 dual-pol antennas, plane-wave pulse from
    (ZEN_TRUE, AZI_TRUE) buried at the LORA trigger time."""
    tmp = tmp_path_factory.mktemp("tbb")
    rng = np.random.default_rng(7)
    n_ant, L, n_total = 16, 4096, 16384
    time_s = 1270000000
    event_id = time_s - 1262304000

    clock_ns = lofar_tbb.get_clock_corrections("LBA", time_s)["CS002"] * 1e9
    # all dipoles start at the same sample except one straggler, which the
    # quality check must flag (starting later than the median,
    # readLOFARData.py:374-376) and whose whole antenna group must go
    sample_numbers = np.full(2 * n_ant, 200)
    sample_numbers[5] = 230
    nominal = int(sample_numbers.max())
    # place the trigger at aligned sample 10000 (block 2 of 4096)
    s_trig = 10000
    lora_ns = clock_ns + (s_trig + nominal) / 0.2

    local_pos = np.zeros((n_ant, 3))
    local_pos[:, :2] = rng.uniform(-150, 150, (n_ant, 2))
    n_dir = lofar.spherical_to_cartesian(ZEN_TRUE, AZI_TRUE)
    delays_ns = -(local_pos @ n_dir) / 0.299792458

    tt = np.arange(n_total)      # absolute sample index after alignment
    dipoles = {}
    for ant in range(n_ant):
        t0 = s_trig + delays_ns[ant] * FS
        pulse = 2000.0 * np.exp(-0.5 * ((tt - t0) / 3.0) ** 2) \
            * np.cos(2 * np.pi * 0.275 * (tt - t0))
        for pol, amp in ((0, 1.0), (1, 0.3)):   # even pol dominates
            i = 2 * ant + pol
            sn = int(sample_numbers[i])
            raw_len = n_total + (nominal - sn)
            trace = rng.normal(0.0, 20.0, raw_len)
            # raw index = aligned index + sample_offset
            trace[nominal - sn:] += amp * pulse
            dipoles[_name(2, i)] = (np.round(trace).astype(np.int16), sn,
                                    0.0, local_pos[ant])

    tag = lofar_tbb.tbb_filetag_from_unix(time_s)
    write_tbb(tmp / f"CS002_{tag}_R000_tbb.h5", dipoles, time_s=time_s)
    with open(tmp / f"{event_id}.json", "w") as f:
        json.dump({"LORA": {
            "utc_time_stamp": time_s, "time_stamp_ns": lora_ns,
            "zenith_rad": float(ZEN_TRUE + np.deg2rad(2.0)),
            "azimuth_rad": float(AZI_TRUE - np.deg2rad(3.0)),
            "core_x_m": 10.0, "core_y_m": -5.0, "energy_GeV": 2.1e8}}, f)
    return tmp, event_id, local_pos


def test_read_lofar_data_event(tbb_event_dir):
    tmp, event_id, local_pos = tbb_event_dir
    det = FakeTBBDetector(local_pos)
    reader = lofar_tbb.readLOFARData(tbb_directory=str(tmp),
                                     json_directory=str(tmp))
    reader.begin(event_id)
    assert "CS002" in reader.get_stations()
    event = next(reader.run(det, trace_length=4096))

    assert event.get_id() == event_id
    shower = event.get_hybrid_information().get_hybrid_shower("LORA")
    assert shower.get_parameter(showerParameters.energy) \
        == pytest.approx(2.1e8 * units.GeV)

    station = event.get_station(2)
    # dipole 5 starts later than the median -> flagged, and its whole
    # antenna group (channels 2000004/2000005) is dropped
    assert station.get_number_of_channels() == 30
    flagged = station.get_parameter(stationParameters.flagged_channels)
    assert flagged[2000005] == ["reader_deviating_channel"]
    assert flagged[2000004] == ["reader_removed_group_id"]
    assert not station.has_channel(2000004)
    ch = station.get_channel(2000000)
    assert ch.get_group_id() == 2000000
    assert len(ch.get_trace()) == 4096
    assert ch.get_sampling_rate() == pytest.approx(FS)
    # the injected pulse sits at the window center (LORA alignment math)
    peak = np.argmax(np.abs(station.get_channel(2000002).get_trace()))
    assert abs(peak - 2048) < 64
    # odd polarisation carries the sub-dominant (30%) signal
    assert np.max(np.abs(station.get_channel(2000001).get_trace())) \
        < 0.5 * np.max(np.abs(station.get_channel(2000000).get_trace()))

    reader.end()


def test_tbb_to_direction_pipeline(tbb_event_dir):
    """Full chain: raw TBB -> Event -> pulse finder -> plane-wave fit
    recovers the injected arrival direction."""
    tmp, event_id, local_pos = tbb_event_dir
    det = FakeTBBDetector(local_pos)
    reader = lofar_tbb.readLOFARData(tbb_directory=str(tmp),
                                     json_directory=str(tmp))
    reader.begin(event_id)
    event = next(reader.run(det, trace_length=4096))
    shower = event.get_hybrid_information().get_hybrid_shower("LORA")
    guess = (shower.get_parameter(showerParameters.zenith),
             shower.get_parameter(showerParameters.azimuth))

    finder = lofar.stationPulseFinder()
    finder.begin(window=256, noise_window=1500, cr_snr=6.5, good_channels=6)
    finder.run(event, det, guess)
    station = event.get_station(2)
    assert station.get_parameter(stationParameters.triggered)

    fitter = lofar.planeWaveDirectionFitter()
    fitter.begin(cr_snr=6.5)
    fitter.run(event, det)
    zen = station.get_parameter(stationParameters.cr_zenith)
    azi = station.get_parameter(stationParameters.cr_azimuth)
    assert abs(zen - ZEN_TRUE) < np.deg2rad(2.0)
    assert abs((azi - AZI_TRUE + np.pi) % (2 * np.pi) - np.pi) \
        < np.deg2rad(2.0)
