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


def test_trigger_combination_ray_selections(tmp_path):
    """min_sigma / ray_solution / n_reflections combination options
    (Veff.py:366-408): synthetic file with 4 single-shower groups, known
    per-ray amplitudes/types/reflections on a 2-channel station."""
    import h5py

    fn = str(tmp_path / "sel.hdf5")
    n = 4
    with h5py.File(fn, "w") as f:
        f["event_group_ids"] = np.arange(n)
        f["shower_ids"] = np.arange(n)
        f["triggered"] = np.ones(n, bool)
        f["weights"] = np.ones(n)
        f["zeniths"] = np.full(n, np.pi / 2)
        f["energies"] = np.full(n, 1e18)
        f["multiple_triggers"] = np.ones((n, 1), bool)
        f.attrs["n_events"] = n
        f.attrs["volume"] = 1.0
        f.attrs["Vrms"] = 1.0
        f.attrs["trigger_names"] = ["T"]
        st = f.create_group("station_101")
        st["event_group_id_per_shower"] = np.arange(n)
        st["shower_id"] = np.arange(n)
        st["event_group_ids"] = np.arange(n)
        st["maximum_amplitudes_envelope"] = np.ones((n, 2))
        # amps[row, channel, solution]: row i has best amp (i+1) sigma on
        # ch0 solution 0; ch1 always 0.5
        amps = np.full((n, 2, 2), 0.1)
        for i in range(n):
            amps[i, 0, 0] = i + 1.0
            amps[i, 1, 0] = 0.5
        st["max_amp_shower_and_ray"] = amps
        sol = np.zeros((n, 2, 2))
        sol[:, 0, 0] = [1, 1, 2, 3]       # best solution's type per row
        st["ray_tracing_solution_type"] = sol
        refl = np.zeros((n, 2, 2))
        refl[3, 0, 0] = 1                 # row 3's best is a bounce
        st["ray_tracing_reflection"] = refl

    def count(combos):
        res = veff.get_Veff_Aeff_single(fn, trigger_combinations=combos,
                                        station=101)
        return res["veffs"]["sel"][2], res

    # min_sigma 2.5 on ch0 (1 coincidence): rows 2, 3 pass (amps 3, 4)
    c, res = count({"sel": {"triggers": "T", "min_sigma": 2.5,
                            "channels": [0], "n_channels": 1}})
    assert c == 2.0
    np.testing.assert_allclose(sorted(res["SNR"]["sel"][:, -1]), [3.0, 4.0])

    # ray_solution: keep rows whose best ch0 solution is type 1 -> rows 0, 1
    c, _ = count({"sel": {"triggers": "T", "ray_solution": 1,
                          "ray_channel": 0}})
    assert c == 2.0

    # n_reflections: best overall solution has 1 bounce -> row 3 only
    c, _ = count({"sel": {"triggers": "T", "n_reflections": 1}})
    assert c == 1.0
    # ... and 0 bounces -> rows 0-2
    c, _ = count({"sel": {"triggers": "T", "n_reflections": 0}})
    assert c == 3.0
