"""Veff post-processing utility tests (split/merge/aggregate)."""
import numpy as np
import pytest

from nuradiomc_tpu.sim import evtgen, io_hdf5, veff
from nuradiomc_tpu.utils import units

VOLUME = {"fiducial_rmin": 0, "fiducial_rmax": 1 * units.km,
          "fiducial_zmin": -1 * units.km, "fiducial_zmax": 0}


@pytest.fixture
def output_file(tmp_path):
    path = str(tmp_path / "events.hdf5")
    evtgen.generate_eventlist_cylinder(path, 500, 1e18, 1e18, VOLUME, seed=3)
    inp = io_hdf5.read_input_hdf5(path)
    rng = np.random.default_rng(0)
    gids = np.unique(inp.event_group_ids)
    trig_group = rng.random(len(gids)) < 0.1
    trig = np.isin(inp.event_group_ids, gids[trig_group])
    out = str(tmp_path / "out.hdf5")
    io_hdf5.write_output_hdf5(out, inp,
                              {"triggered": trig,
                               "weights": np.full(inp.n_showers, 0.5)},
                              {"Veff": 0.0})
    return out, trig_group.sum(), inp


def test_single_file_veff(output_file):
    out, n_trig, inp = output_file
    res = veff.get_Veff_Aeff_single(out)
    assert res["n_triggered"] == n_trig
    expected = float(inp.attrs["volume"]) * 0.5 * n_trig / 500
    np.testing.assert_allclose(res["veff"], expected, rtol=1e-12)
    assert abs(res["solid_angle"] - 4 * np.pi) < 1e-9
    assert res["veff_low"] < res["veff"] < res["veff_high"]


def test_split_and_merge(tmp_path, output_file):
    out, n_trig, inp = output_file
    parts = veff.split_input_hdf5(out, str(tmp_path / "split"), 100)
    assert len(parts) == 5
    total = 0
    for p in parts:
        pi = io_hdf5.read_input_hdf5(p)
        total += pi.attrs["n_events"]
    assert total == 500

    merged = veff.merge_output_hdf5(parts, str(tmp_path / "merged.hdf5"))
    m = io_hdf5.read_input_hdf5(merged)
    assert m.attrs["n_events"] == 500
    assert m.n_showers == inp.n_showers


def test_fc_limits_monotone():
    prev_high = 0
    for n in range(15):
        lo, hi = veff.FC_limits(n)
        assert lo <= n <= hi
        assert hi > prev_high
        prev_high = hi
