"""Atmospheric-muon effective-area workflow end-to-end
(test/atmospheric_Aeff/1e18eV: generate_surface_muons -> full simulation ->
Aeff), compared statistically against the reference CI anchor.

The reference's own anchor is statistical: Aeff = 0.45027 km2 with a
0.06549 km2 spread over 256 re-runs (T03check_output.py:44-47 — PROPOSAL
secondaries are not seed-stable across systems, so the reference checks
sigma-distance, not equality). Our in-ice losses come from the in-repo
stochastic propagator (sim/muon_propagation.py, the standard a+bE
parameterization) instead of PROPOSAL — a documented approximation whose
loss-spectrum tail differs at the ~10% level, so the tolerance below covers
the reference's own 1-run spread PLUS that systematic.
"""
import os

import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from nuradiomc_tpu.sim import evtgen
from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
from nuradiomc_tpu.sim.veff import get_Veff_Aeff_single, remove_duplicate_triggers
from nuradiomc_tpu.utils import units

AEFF_MEAN = 0.45027 * units.km ** 2     # T03check_output.py:44
AEFF_SIGMA = 0.06549 * units.km ** 2    # spread over 256 reference re-runs

DETECTOR = {
    "channels": {"1": {
        "adc_n_samples": 256, "adc_sampling_frequency": 1.0,
        "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
        "ant_position_x": 0.0, "ant_position_y": 0.0, "ant_position_z": -100.0,
        "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
        "ant_type": "XFDTD_Vpol_CrossFeed_150mmHole_n1.78",
        "amp_type": "300", "cab_time_delay": 19.8, "adc_nbits": None,
        "channel_id": 0, "station_id": 101,
    }},
    "stations": {"1": {
        "pos_altitude": 0, "pos_easting": 0, "pos_northing": 0,
        "pos_site": "southpole", "station_id": 101,
    }},
}


@pytest.mark.slow
def test_atmospheric_aeff_within_reference_band(tmp_path):
    """2500 surface muons at 1e18 eV, 58-62 deg zenith, dipole@100m, 2-sigma
    high-low — the reference CI configuration
    (atmospheric_Aeff/1e18eV/T01+T02). Assert the Aeff within 2x the
    reference's own run-to-run sigma of the anchor mean (covers the 1-run
    Poisson spread ~0.065 km2 and the stochastic-vs-PROPOSAL loss-model
    systematic, measured at +14% on seed 42: 0.512 vs 0.450 km2 ~ 0.95
    sigma)."""
    infile = str(tmp_path / "mu.hdf5")
    evtgen.generate_surface_muons(
        infile, 2500, 1e18, 1e18,
        {"fiducial_rmin": 0, "fiducial_rmax": 4 * units.km,
         "fiducial_zmin": -3 * units.km, "fiducial_zmax": 0},
        thetamin=np.deg2rad(58), thetamax=np.deg2rad(62),
        seed=42, secondaries="stochastic")

    out = str(tmp_path / "out.hdf5")
    sim = Simulation(
        infile, DETECTOR,
        config={"sampling_rate": 2.0,
                "propagation": {"ice_model": "southpole_2015"},
                "signal": {"model": "Alvarez2000"},
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
        chunk_size=256, dtype=jnp.float64, outputfilename=out)
    res = sim.run()
    # atmospheric muons are not earth-absorbed: weights identically 1
    np.testing.assert_array_equal(res["weights"], 1.0)

    # Aeff exactly as the reference computes it (T03check_output.py:11-31)
    with h5py.File(out) as f:
        trig = np.asarray(f["triggered"])
        gid = np.asarray(f["event_group_ids"])
        w = np.asarray(f["weights"])
        n_events = int(f.attrs["n_events"])
        area = float(f.attrs["area"])
        tmin = float(f.attrs["thetamin"])
        tmax = float(f.attrs["thetamax"])
    t = remove_duplicate_triggers(trig, gid)
    n_trig = float(np.sum(w[t]))
    projected = area * 0.5 * (np.cos(tmin) + np.cos(tmax))
    aeff = projected * n_trig / n_events

    assert n_trig > 10
    assert abs(aeff - AEFF_MEAN) < 2 * AEFF_SIGMA, (
        f"Aeff {aeff / units.km**2:.4f} km2 vs anchor "
        f"{AEFF_MEAN / units.km**2:.4f} +- {AEFF_SIGMA / units.km**2:.4f}")

    # the post-processing layer's aeff_surface_muons mode agrees with the
    # hand computation (projected-area convention, Veff.py:268-275)
    post = get_Veff_Aeff_single(out, veff_aeff="aeff_surface_muons",
                                min_weight=0.0)
    np.testing.assert_allclose(
        post["aeff_surface_muons"][post["trigger_names"][0]][0], aeff,
        rtol=1e-9)
