"""Full output-HDF5 schema test: run the dipole e2e config writing the output
file and compare the station group against the reference's station data
(from tests/golden/e2e_reference.npz)."""
import os

import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
from nuradiomc_tpu.utils import units
from tests.test_e2e import DETECTOR, GOLDEN, INPUT


@pytest.fixture(scope="module")
def output(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out") / "output.hdf5")
    sim = Simulation(
        INPUT, DETECTOR,
        config={"sampling_rate": 2.0,
                "propagation": {"ice_model": "southpole_2015"},
                "signal": {"model": "Alvarez2000"},
                "weights": {"weight_mode": "core_mantle_crust_simple",
                            "cross_section_type": "ctw"}},
        filter_chain=[
            FilterStage((80 * units.MHz, 1000 * units.GHz), "butter", {"order": 2}),
            FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
        ],
        trigger=TriggerSpec(threshold_high_sigma=2.0, threshold_low_sigma=-2.0),
        antenna_replacements={
            "XFDTD_Vpol_CrossFeed_150mmHole_n1.78": "analytic_VPol"},
        chunk_size=512, dtype=jnp.float64, outputfilename=out)
    sim.run()
    return out


def test_top_level_schema(output):
    with h5py.File(output) as f:
        for key in ("event_group_ids", "xx", "yy", "zz", "zeniths", "azimuths",
                    "energies", "shower_energies", "flavors", "inelasticity",
                    "shower_type", "interaction_type", "triggered", "weights",
                    "multiple_triggers", "trigger_times", "shower_ids",
                    "vertex_times"):
            assert key in f, key
        for attr in ("Veff", "Vrms", "bandwidth", "n_events", "volume",
                     "trigger_names", "antenna_positions"):
            assert attr in f.attrs, attr


def test_station_group_matches_reference(output):
    golden = np.load(GOLDEN)
    with h5py.File(output) as f:
        st = f["station_101"]
        for key in ("event_group_ids", "shower_id", "max_amp_shower_and_ray",
                    "ray_tracing_C0", "ray_tracing_C1", "launch_vectors",
                    "receive_vectors", "travel_times", "travel_distances",
                    "polarization", "maximum_amplitudes", "triggered"):
            assert key in st, key

        # match by shower id against the reference station output. The
        # reference skips sub-weight-cut events; ours may contain extras.
        my_sid = np.asarray(st["shower_id"])
        ref_sid = golden["st_shower_id"]
        for j, sid in enumerate(ref_sid):
            k = np.where(my_sid == sid)[0]
            assert len(k) == 1, sid
            k = int(k[0])
            ref_c0 = golden["st_ray_tracing_C0"][j, 0]
            have = ~np.isnan(ref_c0)
            np.testing.assert_allclose(np.asarray(st["ray_tracing_C0"])[k, 0][have],
                                       ref_c0[have], rtol=1e-7)
            np.testing.assert_allclose(np.asarray(st["travel_times"])[k, 0][have],
                                       golden["st_travel_times"][j, 0][have], rtol=1e-6)
            np.testing.assert_allclose(
                np.asarray(st["max_amp_shower_and_ray"])[k, 0][have],
                golden["st_max_amp_shower_and_ray"][j, 0][have], rtol=2e-2)
            np.testing.assert_allclose(
                np.asarray(st["launch_vectors"])[k, 0][have],
                golden["st_launch_vectors"][j, 0][have], atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(st["polarization"])[k, 0][have],
                golden["st_polarization"][j, 0][have], atol=1e-5)


def test_shower_realization_persistence(tmp_path):
    """shower_realization_Alvarez2009 is written per shower and reused when
    present in the input (reference output_writer_hdf5.py:182-184 +
    simulation.py:737-740): a rerun on a previous output reproduces the
    identical stochastic realization and triggered set."""
    from nuradiomc_tpu.sim import evtgen, io_hdf5

    inp = str(tmp_path / "in.hdf5")
    out1 = str(tmp_path / "out1.hdf5")
    out2 = str(tmp_path / "out2.hdf5")
    evtgen.generate_eventlist_cylinder(
        inp, 200, 1e18, 1e18,
        {"fiducial_rmin": 0, "fiducial_rmax": 3 * units.km,
         "fiducial_zmin": -2.7 * units.km, "fiducial_zmax": 0}, seed=5)

    def run(infile, outfile, seed):
        sim = Simulation(
            infile, DETECTOR,
            config={"sampling_rate": 2.0, "seed": seed,
                    "propagation": {"ice_model": "southpole_2015"},
                    "signal": {"model": "Alvarez2009"},
                    "weights": {"weight_mode": "core_mantle_crust_simple",
                                "cross_section_type": "ctw"}},
            filter_chain=[
                FilterStage((80 * units.MHz, 1000 * units.GHz), "butter",
                            {"order": 2}),
                FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
            ],
            trigger=TriggerSpec(threshold_high_sigma=2.0,
                                threshold_low_sigma=-2.0),
            antenna_replacements={
                "XFDTD_Vpol_CrossFeed_150mmHole_n1.78": "analytic_VPol"},
            chunk_size=256, dtype=jnp.float64, outputfilename=outfile)
        return sim.run()

    res1 = run(inp, out1, seed=1234)
    with h5py.File(out1) as f:
        assert "shower_realization_Alvarez2009" in f
        k_L1 = np.asarray(f["shower_realization_Alvarez2009"])
    assert np.all(k_L1 > 0)

    # rerun on the previous output with a DIFFERENT seed: the persisted
    # realization must win over the fresh draw
    res2 = run(out1, out2, seed=999)
    with h5py.File(out2) as f:
        k_L2 = np.asarray(f["shower_realization_Alvarez2009"])
    np.testing.assert_array_equal(k_L1, k_L2)
    np.testing.assert_array_equal(res1["triggered"], res2["triggered"])
    assert res1["veff"] == pytest.approx(res2["veff"])

    # the reader surfaces the column
    ei = io_hdf5.read_input_hdf5(out1)
    np.testing.assert_array_equal(ei.shower_realization_Alvarez2009, k_L1)
