"""IceCube-Gen2-style composed workload (driver benchmark config #5):
multi-station radio array x stochastic tau secondaries (multi-shower
interference) x birefringence-enabled propagation — in ONE production run,
single-device and under the virtual 8-device mesh (equality)."""
import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# the composed Gen2 goldens dominate suite wall-clock (fixture ~7 min +
# mesh-equality ~18 min on the 1-core host): heavy tier
pytestmark = pytest.mark.heavy

from nuradiomc_tpu.parallel import mesh as mesh_util
from nuradiomc_tpu.sim import evtgen
from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
from nuradiomc_tpu.utils import units


def _channel(cid, sid, z):
    return {"adc_n_samples": 256, "adc_sampling_frequency": 1.0,
            "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
            "ant_position_x": 0.0, "ant_position_y": 0.0, "ant_position_z": z,
            "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
            "ant_type": "analytic_VPol", "amp_type": "",
            "cab_time_delay": 10.0, "adc_nbits": None,
            "channel_id": cid, "station_id": sid}


# three deep stations on a ~1.7 km Gen2-like grid, two VPols each
GEN2_DET = {
    "channels": {
        "1": _channel(0, 101, -100.0), "2": _channel(1, 101, -150.0),
        "3": _channel(0, 102, -100.0), "4": _channel(1, 102, -150.0),
        "5": _channel(0, 103, -100.0), "6": _channel(1, 103, -150.0),
    },
    "stations": {
        "1": {"station_id": 101, "pos_easting": 0.0, "pos_northing": 0.0,
              "pos_altitude": 0},
        "2": {"station_id": 102, "pos_easting": 1700.0, "pos_northing": 0.0,
              "pos_altitude": 0},
        "3": {"station_id": 103, "pos_easting": 850.0,
              "pos_northing": 1470.0, "pos_altitude": 0},
    },
}

GEN2_CONFIG = {
    "sampling_rate": 2.0,
    "propagation": {"ice_model": "southpole_2015",
                    "birefringence": True,
                    "birefringence_model": "southpole_A"},
    "signal": {"model": "Alvarez2000"},
    "weights": {"weight_mode": "core_mantle_crust_simple",
                "cross_section_type": "ctw"},
}

FILTERS = [
    FilterStage((80 * units.MHz, 1000 * units.GHz), "butter", {"order": 2}),
    FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
]


@pytest.fixture(scope="module")
def gen2_input(tmp_path_factory):
    """Tau CC events with stochastic secondary showers along the outgoing
    tau track — the multi-shower interference workload."""
    path = str(tmp_path_factory.mktemp("gen2") / "taus.hdf5")
    evtgen.generate_eventlist_cylinder(
        path, 400, 1e19, 1e19,
        {"fiducial_rmin": 0, "fiducial_rmax": 3 * units.km,
         "fiducial_zmin": -2.7 * units.km, "fiducial_zmax": 0},
        seed=21, flavor=(16, -16), interaction_type="cc",
        secondaries="stochastic")
    return path


def _run(gen2_input, tmp_path, mesh=None, tag="single"):
    out = str(tmp_path / f"out_{tag}.hdf5")
    sim = Simulation(
        gen2_input, GEN2_DET, config=GEN2_CONFIG, filter_chain=FILTERS,
        trigger=TriggerSpec(threshold_high_sigma=2.0,
                            threshold_low_sigma=-2.0),
        chunk_size=200, dtype=jnp.float64, outputfilename=out, mesh=mesh)
    return sim, sim.run(), out


@pytest.fixture(scope="module")
def single_results(gen2_input, tmp_path_factory):
    return _run(gen2_input, tmp_path_factory.mktemp("g2s"))


def test_gen2_composition_physics(gen2_input, single_results):
    sim, res, out = single_results
    # the workload actually composes all three ingredients:
    # (1) secondaries produced multi-shower event groups
    with h5py.File(gen2_input) as f:
        gids = np.asarray(f["event_group_ids"])
        assert (np.unique(gids, return_counts=True)[1] > 1).any(), \
            "no stochastic secondaries in the input"
    # (2) birefringence is on in the compiled settings
    assert sim.settings.birefringence
    # (3) all three stations are simulated and written
    with h5py.File(out) as f:
        for sid in (101, 102, 103):
            assert f"station_{sid}" in f
    assert res["triggered"].sum() > 0
    assert np.isfinite(res["veff"])


def test_gen2_mesh_equals_single_device(gen2_input, single_results,
                                        tmp_path_factory):
    assert len(jax.devices()) == 8
    mesh = mesh_util.make_mesh(n_event=4, n_channel=2)
    _, res_m, _ = _run(gen2_input, tmp_path_factory.mktemp("g2m"),
                       mesh=mesh, tag="mesh")
    _, res_s, _ = single_results
    np.testing.assert_array_equal(res_m["triggered"], res_s["triggered"])
    np.testing.assert_allclose(res_m["veff"], res_s["veff"], rtol=1e-12)


def test_gen2_birefringence_changes_amplitudes(gen2_input, single_results,
                                               tmp_path_factory):
    """Sanity: birefringence actually alters the waveform-level results
    (guards against the flag silently not reaching the kernel)."""
    cfg = {**GEN2_CONFIG,
           "propagation": {"ice_model": "southpole_2015",
                           "birefringence": False}}
    out = str(tmp_path_factory.mktemp("g2n") / "out.hdf5")
    sim = Simulation(gen2_input, GEN2_DET, config=cfg, filter_chain=FILTERS,
                     trigger=TriggerSpec(threshold_high_sigma=2.0,
                                         threshold_low_sigma=-2.0),
                     chunk_size=200, dtype=jnp.float64, outputfilename=out)
    res_off = sim.run()
    _, res_on, _ = single_results
    sel = res_on["triggered"] | res_off["triggered"]
    assert sel.any()
    assert not np.allclose(res_on["max_amplitude"][sel],
                           res_off["max_amplitude"][sel], rtol=1e-6)
