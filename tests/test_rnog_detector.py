"""RNO-G detector from a version-1 export file (detector/rnog_detector.py) —
the reference's MongoDB detector API (RNO_G/rnog_detector.py) served from its
own documented export format, no database service needed."""
import datetime
import json
import lzma

import numpy as np
import pytest

from nuradiomc_tpu.detector.rnog_detector import RNOGDetector
from nuradiomc_tpu.utils import units


def make_export():
    ff = np.linspace(0.05, 1.0, 96)              # GHz
    mag_db = 40.0 - 10.0 * (ff - 0.4) ** 2       # smooth amp gain in dB
    delay = 20.0                                  # ns
    phase_deg = np.rad2deg(-2 * np.pi * ff * delay + 0.3)

    iglu = {"collection": "iglu_board", "name": "C0123",
            "frequencies": ff.tolist(),
            "mag": mag_db.tolist(), "phase": phase_deg.tolist(),
            "y-axis_units": ["dB", "deg"], "time_delay": delay, "weight": 1}
    atten = {"collection": "gain_calibration", "name": "att6",
             "gain_factor": -6.0, "gain_factor_unit": "dB"}
    fiber = {"collection": "time_delays", "name": "fiber",
             "time_delay": 600.0, "time_delay_unit": "ns"}

    channel = {
        "id_position": "pos0", "ant_type": "VPol",
        "channel_position": {
            "position": [1.0, 2.0, -95.0],
            "orientation": {"theta": 0.0, "phi": 0.0},
            "rotation": {"theta": 90.0, "phi": 90.0}},
        "signal_chain": {"VEL": "RNOG_vpol_v1_n1.4",
                         "response_chain": [iglu, atten, fiber],
                         "total_response": None},
    }
    ch1 = json.loads(json.dumps(channel))
    ch1["channel_position"]["position"] = [0.0, 0.0, -96.0]

    return {
        "version": 1,
        "data": {"11": {
            "station_position": {"position": [100.0, 200.0, 0.0]},
            "channels": {"0": channel, "1": ch1},
            "devices": {"5": {"device_name": "pulser",
                              "device_position": {"position": [3.0, 0.0, -50.0]}}},
            "signal_digitizer_config": {"sampling_frequency": 3.2,
                                        "number_of_samples": 2048},
            "trigger_digitizer_config": {"sampling_frequency": 0.472,
                                         "number_of_samples": 2048},
        }},
        "periods": {"11": {"modification_timestamps":
                           ["2021-01-01T00:00:00", "2026-01-01T00:00:00"]}},
        "default_values": {"noise_temperature": 300 * units.kelvin,
                           "is_noiseless": False},
    }


@pytest.fixture()
def det(tmp_path):
    path = str(tmp_path / "rnog_export.json")
    with open(path, "w") as f:
        json.dump(make_export(), f)
    d = RNOGDetector(path)
    d.update(datetime.datetime(2023, 6, 1))
    return d


def test_station_and_channel_info(det):
    assert det.get_station_ids() == [11]
    assert det.has_station(11) and not det.has_station(12)
    assert det.get_channel_ids(11) == [0, 1]
    assert det.get_number_of_channels(11) == 2
    np.testing.assert_allclose(det.get_absolute_position(11), [100, 200, 0])
    np.testing.assert_allclose(det.get_relative_position(11, 0), [1, 2, -95])
    np.testing.assert_allclose(det.get_channel_orientation(11, 0),
                               np.deg2rad([0, 0, 90, 90]))
    assert det.get_antenna_model(11, 0) == "RNOG_vpol_v1_n1.4"
    assert det.get_antenna_type(11, 0) == "VPol"
    assert det.get_number_of_samples(11) == 2048
    assert det.get_sampling_frequency(11) == 3.2
    assert det.get_sampling_frequency(11, trigger=True) == 0.472
    assert det.get_noise_temperature(11, 0) == 300 * units.kelvin
    assert det.is_channel_noiseless(11, 0) is False
    # get_channel merges defaults + digitizer configs (adc_ prefixes)
    ch = det.get_channel(11, 0)
    assert ch["adc_sampling_frequency"] == 3.2
    assert ch["trigger_adc_sampling_frequency"] == 0.472
    assert ch["noise_temperature"] == 300 * units.kelvin
    assert det.get_devices(11) == {5: "pulser"}
    np.testing.assert_allclose(det.get_relative_position_device(11, 5),
                               [3, 0, -50])


def test_signal_chain_composition(det):
    """Chain = measured iglu (dB/deg, group delay removed) x -6 dB
    calibration x fiber delay entry; delays sum via get_time_delay."""
    resp = det.get_signal_chain_response(11, 0)
    ff = np.linspace(0.1, 0.9, 50)
    vals = resp(ff)
    # |H| = 10^((mag_db - 6)/20)
    expect_mag = 10 ** ((40.0 - 10.0 * (ff - 0.4) ** 2 - 6.0) / 20)
    np.testing.assert_allclose(np.abs(vals), expect_mag, rtol=1e-3)
    # phase after removing the 20 ns group delay is the constant 0.3 rad
    np.testing.assert_allclose(np.angle(vals), 0.3, atol=1e-6)
    # delays: 20 ns (iglu) + 600 ns (fiber)
    assert det.get_time_delay(11, 0) == pytest.approx(620.0)
    assert det.get_cable_delay(11, 0) == pytest.approx(620.0)
    # evaluated helper
    np.testing.assert_allclose(det.get_amplifier_response(11, 0, ff), vals)
    assert "iglu_board:C0123" in resp.get_names()


def test_time_validity_and_xz(tmp_path):
    exp = make_export()
    path = str(tmp_path / "rnog_export.json.xz")
    with lzma.open(path, "wt") as f:
        json.dump(exp, f)
    det = RNOGDetector(path, selected_stations=[11])
    det.update(datetime.datetime(2022, 1, 1))
    assert det.get_station_ids() == [11]
    with pytest.raises(ValueError):
        det.update(datetime.datetime(2027, 1, 1))
    with pytest.raises(NotImplementedError):
        RNOGDetector()  # live DB queries need the Mongo service
