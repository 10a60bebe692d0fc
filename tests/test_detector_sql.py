"""sqlite3-backed SQL detector (detector/detector_sql.py) — the reference's
MySQL detector backend (detector_sql.py) + buffer_db (detector_base.py:39-130)
re-implemented on a serverless relational store."""
import datetime

import numpy as np
import pytest

from nuradiomc_tpu.detector.detector import Detector
from nuradiomc_tpu.detector.detector_sql import SQLDetector, export_detector_to_sql


@pytest.fixture()
def detector_dict():
    from test_e2e import DETECTOR
    return DETECTOR


def test_sql_roundtrip_matches_json(tmp_path, detector_dict):
    path = str(tmp_path / "det.sqlite")
    export_detector_to_sql(detector_dict, path).close()

    det_sql = Detector(path, default_station=101)
    det_json = Detector(detector_dict, default_station=101)

    assert det_sql.get_station_ids() == det_json.get_station_ids()
    sid = det_json.get_station_ids()[0]
    assert det_sql.get_channel_ids(sid) == det_json.get_channel_ids(sid)
    for cid in det_json.get_channel_ids(sid):
        np.testing.assert_allclose(det_sql.get_relative_position(sid, cid),
                                   det_json.get_relative_position(sid, cid))
        np.testing.assert_allclose(det_sql.get_antenna_orientation(sid, cid),
                                   det_json.get_antenna_orientation(sid, cid))
        assert det_sql.get_cable_delay(sid, cid) == det_json.get_cable_delay(sid, cid)
        assert det_sql.get_number_of_samples(sid, cid) == det_json.get_number_of_samples(sid, cid)
        assert det_sql.get_sampling_frequency(sid, cid) == det_json.get_sampling_frequency(sid, cid)
        assert det_sql.get_antenna_model(sid, cid) == det_json.get_antenna_model(sid, cid)


def test_sql_accessors_and_commissioning(tmp_path, detector_dict):
    """Per-field accessors (detector_sql.py:222-470 API) + time-dependent
    channel validity via update() (detector_sql.py:51, WHERE time BETWEEN
    commission AND decommission)."""
    import copy
    dd = copy.deepcopy(detector_dict)
    ch2 = copy.deepcopy(list(dd["channels"].values())[0])
    ch2["channel_id"] = 1
    ch2["ant_position_z"] = -110.0
    dd["channels"]["2"] = ch2
    chans = list(dd["channels"].values())
    sid = chans[0]["station_id"]
    # decommission one channel in 2018
    chans[0]["decommission_time"] = "2018-01-01 00:00:00"
    path = str(tmp_path / "det.sqlite")
    sql = export_detector_to_sql(dd, path)

    sql.update(datetime.datetime(2017, 6, 1))
    n_before = sql.get_number_of_channels(sid)
    assert len(sql.get_everything(sid)) == n_before
    pos = sql.get_relative_position(sid, chans[0]["channel_id"])
    assert pos == [chans[0]["ant_position_x"], chans[0]["ant_position_y"],
                   chans[0]["ant_position_z"]]
    assert sql.get_amplifier_type(sid, chans[1]["channel_id"]) == chans[1]["amp_type"]

    sql.update(datetime.datetime(2020, 6, 1))
    assert sql.get_number_of_channels(sid) == n_before - 1
    with pytest.raises(KeyError):
        sql.get_relative_position(sid, chans[0]["channel_id"])

    # station table join carries positions
    st = sql.get_everything_stations()
    assert len(st) >= 1 and "easting" in st[0]
    sql.close()


def test_sql_detector_through_simulation(tmp_path, detector_dict):
    """A Simulation built from the sqlite file produces the same triggered
    set as one built from the dict."""
    import jax.numpy as jnp
    from nuradiomc_tpu.sim import evtgen
    from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
    from nuradiomc_tpu.utils import units

    infile = str(tmp_path / "in.hdf5")
    evtgen.generate_eventlist_cylinder(
        infile, 200, 1e18, 1e18,
        {"fiducial_rmin": 0, "fiducial_rmax": 3 * units.km,
         "fiducial_zmin": -2.7 * units.km, "fiducial_zmax": 0}, seed=7)

    path = str(tmp_path / "det.sqlite")
    export_detector_to_sql(detector_dict, path).close()

    kwargs = dict(
        config={"sampling_rate": 2.0,
                "propagation": {"ice_model": "southpole_2015"},
                "signal": {"model": "Alvarez2000"}},
        filter_chain=[FilterStage((80 * units.MHz, 1000 * units.GHz), "butter", {"order": 2}),
                      FilterStage((0, 500 * units.MHz), "butter", {"order": 10})],
        trigger=TriggerSpec(threshold_high_sigma=2.0, threshold_low_sigma=-2.0),
        antenna_replacements={"XFDTD_Vpol_CrossFeed_150mmHole_n1.78": "analytic_VPol"},
        chunk_size=256, dtype=jnp.float64)

    res_sql = Simulation(infile, path, **kwargs).run()
    res_json = Simulation(infile, detector_dict, **kwargs).run()
    np.testing.assert_array_equal(res_sql["triggered"], res_json["triggered"])
