"""Multi-station simulation: OR-aggregated triggers and per-station output
groups (output_writer_hdf5.py:350-381 semantics)."""
import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from nuradiomc_tpu.sim import evtgen
from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
from nuradiomc_tpu.utils import units


def _channel(cid, sid, x, y):
    return {"adc_n_samples": 256, "adc_sampling_frequency": 1.0,
            "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
            "ant_position_x": x, "ant_position_y": y, "ant_position_z": -100.0,
            "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
            "ant_type": "analytic_VPol", "amp_type": "", "cab_time_delay": 10.0,
            "adc_nbits": None, "channel_id": cid, "station_id": sid}


DET = {
    "channels": {"1": _channel(0, 101, 0.0, 0.0),
                 "2": _channel(0, 102, 0.0, 0.0)},
    "stations": {"1": {"station_id": 101, "pos_easting": 0.0, "pos_northing": 0.0,
                       "pos_altitude": 0},
                 "2": {"station_id": 102, "pos_easting": 1500.0,
                       "pos_northing": 0.0, "pos_altitude": 0}},
}


def test_two_station_or_trigger(tmp_path):
    inp = str(tmp_path / "events.hdf5")
    volume = {"fiducial_rmin": 0, "fiducial_rmax": 3 * units.km,
              "fiducial_zmin": -2.7 * units.km, "fiducial_zmax": 0}
    evtgen.generate_eventlist_cylinder(inp, 600, 1e18, 1e18, volume, seed=4)

    out = str(tmp_path / "out.hdf5")
    sim = Simulation(
        inp, DET,
        config={"sampling_rate": 2.0,
                "propagation": {"ice_model": "southpole_2015"},
                "signal": {"model": "Alvarez2000"},
                "weights": {"weight_mode": "core_mantle_crust_simple",
                            "cross_section_type": "ctw"}},
        filter_chain=[
            FilterStage((80 * units.MHz, 1000 * units.GHz), "butter", {"order": 2}),
            FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
        ],
        trigger=TriggerSpec(),
        chunk_size=300, dtype=jnp.float64, outputfilename=out)
    res = sim.run()

    # the OR trigger can only add events relative to the primary station
    trig_primary = sim._run_station(101, sim._build_batches()[4])[0]
    assert res["triggered"].sum() >= trig_primary.sum()

    with h5py.File(out) as f:
        assert "station_101" in f and "station_102" in f
        # events triggering the displaced station are recorded there
        n_101 = len(np.unique(f["station_101"]["event_group_ids"])) \
            if "event_group_ids" in f["station_101"] else 0
        n_102 = len(np.unique(f["station_102"]["event_group_ids"])) \
            if "event_group_ids" in f["station_102"] else 0
        _, first = np.unique(np.asarray(f["event_group_ids"]), return_index=True)
        n_total = int(np.asarray(f["triggered"])[first].sum())
        assert n_total >= max(n_101, n_102)
        assert n_total <= n_101 + n_102
