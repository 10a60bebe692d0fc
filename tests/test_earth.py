"""PREM / core_mantle_crust path-aware Earth-absorption weights vs golden
reference values (earth_attenuation.py:127-289)."""
import os

import numpy as np

from nuradiomc_tpu.sim import earth_attenuation as ea

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "earth.npz")


def _direction(theta, phi):
    return np.stack([np.sin(theta) * np.cos(phi),
                     np.sin(theta) * np.sin(phi), np.cos(theta)], -1)


def test_slant_depth_vs_reference():
    g = np.load(GOLDEN)
    d = _direction(g["theta"], g["phi"])
    for model, key in [(ea.PREM, "sd_prem"), (ea.CORE_MANTLE_CRUST, "sd_cmc")]:
        sd = model.slant_depth(g["verts"], d, n_samples=16384)
        ref = g[key]
        nz = ref > 0
        # residual is the reference's own 500-m trapezoid discretization
        assert np.max(np.abs(sd[nz] - ref[nz]) / ref[nz]) < 1e-3
        np.testing.assert_array_equal(sd[~nz], 0.0)


def test_path_weights_vs_reference():
    g = np.load(GOLDEN)
    for mode, key in [("PREM", "w_prem"), ("core_mantle_crust", "w_cmc")]:
        w = ea.get_weight(g["theta"], g["pnu"], g["flav"], mode=mode,
                          cross_section_type="ctw",
                          vertex_position=g["verts"], phi_nu=g["phi"])
        assert np.max(np.abs(w - g[key])) < 5e-3
        assert np.all((w >= 0) & (w <= 1))


def test_downgoing_chord_is_short():
    # a nearly vertical down-going neutrino only crosses the local overburden
    v = np.array([[0.0, 0.0, -1000.0]])
    d = _direction(np.array([0.01]), np.array([0.0]))  # source near zenith
    sd = ea.PREM.slant_depth(v, d)
    from nuradiomc_tpu.utils import units
    # ~1 km of PREM's top (ocean) layer at 1.02 g/cm^3
    expected = 1000.0 * units.m * 1.02 * units.g / units.cm ** 3
    assert abs(sd[0] / expected - 1) < 0.05


def test_prem_density_profile():
    from nuradiomc_tpu.utils import units
    rho = ea.PREM.density(np.array([0.0, 3.0e6, 6.0e6, 6.37e6, 7.0e6]))
    rho_gcm3 = rho / (units.g / units.cm ** 3)
    assert abs(rho_gcm3[0] - 13.0885) < 1e-6     # center
    assert 9 < rho_gcm3[1] < 13                  # outer core
    assert 3 < rho_gcm3[2] < 4                   # upper mantle
    assert abs(rho_gcm3[3] - 1.02) < 1e-6        # ocean layer
    assert rho_gcm3[4] == 0.0                    # outside the Earth
