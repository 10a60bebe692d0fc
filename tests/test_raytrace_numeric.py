"""Numerical stratified tracer vs the analytic solver (exponential profile)
and vs independent adaptive quadrature (greenland_firn double exponential).

Replaces the reference's external RadioPropa path for stratified profiles
(SignalProp/radioproparaytracing.py)."""
import jax
import numpy as np
import pytest
from scipy import integrate

from nuradiomc_tpu.models import ice as ice_models
from nuradiomc_tpu.models.ice_profiles import get_profile, greenland_firn
from nuradiomc_tpu.ops import raytrace
from nuradiomc_tpu.ops.raytrace_numeric import find_solutions_numeric
from nuradiomc_tpu.utils.constants import speed_of_light

ICE = ice_models.get_ice_model("greenland_simple")


class _SimpleAdapter:
    """Expose the analytic IceModelSimple as a generic n(z) profile."""
    z_bottom = -3000.0

    def index_of_refraction(self, z):
        return ICE.index_of_refraction(z)


def test_matches_analytic_on_exponential():
    rng = np.random.default_rng(0)
    prof = _SimpleAdapter()
    for _ in range(12):
        z1 = rng.uniform(-1500, -200)
        z2 = rng.uniform(-150, -40)
        r = rng.uniform(100, 1500)
        ana = raytrace.find_solutions(0.0, z1, r, z2, ICE)
        num = find_solutions_numeric(prof, 0.0, z1, r, z2)
        for slot in range(2):
            if not bool(ana.mask[slot]):
                continue
            # match by solution type
            st_a = int(ana.sol_type[slot])
            idx = [s for s in range(2)
                   if bool(num.mask[s]) and int(num.sol_type[s]) == st_a]
            assert idx, f"numeric solver lost a type-{st_a} solution"
            s = idx[0]
            np.testing.assert_allclose(float(num.travel_time[s]),
                                       float(ana.travel_time[slot]),
                                       rtol=2e-4)
            np.testing.assert_allclose(float(num.path_length[s]),
                                       float(ana.path_length[slot]),
                                       rtol=2e-4)
            np.testing.assert_allclose(float(num.launch_angle[s]),
                                       float(ana.launch_angle[slot]),
                                       atol=2e-4)


def _quad_advance(prof, s, z_lo, z_hi):
    n = lambda z: float(prof.index_of_refraction(z))
    f = lambda z: s / np.sqrt(max(n(z) ** 2 - s ** 2, 1e-14))
    val, _ = integrate.quad(f, z_lo, z_hi, limit=400)
    return val


def _quad_time(prof, s, z_lo, z_hi):
    n = lambda z: float(prof.index_of_refraction(z))
    f = lambda z: n(z) ** 2 / np.sqrt(max(n(z) ** 2 - s ** 2, 1e-14))
    val, _ = integrate.quad(f, z_lo, z_hi, limit=400)
    return val / speed_of_light


def test_firn_solutions_validated_by_quadrature():
    prof = greenland_firn
    z1, z2, r = -700.0, -80.0, 900.0
    num = find_solutions_numeric(prof, 0.0, z1, r, z2)
    assert bool(num.mask[0]) and bool(num.mask[1])
    # direct solution: independent adaptive quadrature reproduces the
    # horizontal distance and the travel time at the solved Snell parameter
    s0 = float(num.s[0])
    adv = _quad_advance(prof, s0, z1, z2)
    np.testing.assert_allclose(adv, r, rtol=2e-3)
    tt = _quad_time(prof, s0, z1, z2)
    np.testing.assert_allclose(float(num.travel_time[0]), tt, rtol=2e-3)
    # mirror solution: leg to the turning/reflection cap and back down
    s1 = float(num.s[1])
    n = lambda z: float(prof.index_of_refraction(z))
    if int(num.sol_type[1]) == 2:       # refracted: find turning depth
        from scipy.optimize import brentq
        z_t = brentq(lambda z: n(z) - s1, -3000.0, -1e-6)
    else:
        z_t = -1e-9
    adv = _quad_advance(prof, s1, z1, z_t) + _quad_advance(prof, s1, z2, z_t)
    np.testing.assert_allclose(adv, r, rtol=2e-3)


def test_firn_shadow_zone_masked():
    # shallow source very far away: no solutions (shadow)
    num = find_solutions_numeric(greenland_firn, 0.0, -20.0, 4000.0, -10.0)
    assert not bool(num.mask[0])


def test_batched_vmap():
    prof = greenland_firn
    rng = np.random.default_rng(1)
    z1 = rng.uniform(-1200, -200, 64)
    z2 = rng.uniform(-150, -30, 64)
    r = rng.uniform(100, 1200, 64)
    sols = jax.vmap(lambda a, b, c: find_solutions_numeric(prof, 0.0, a, c, b))(
        z1, z2, r)
    assert sols.travel_time.shape == (64, 2)
    ok = np.asarray(sols.mask)
    assert ok.any()
    tt = np.asarray(sols.travel_time)
    assert np.all(tt[ok] > 0)


def test_poly5_profile_sane():
    prof = get_profile("greenland_poly5")
    n_surface = float(prof.index_of_refraction(-0.01))
    n_deep = float(prof.index_of_refraction(-2000.0))
    assert 1.2 < n_surface < 1.5
    assert 1.7 < n_deep < 1.85
    num = find_solutions_numeric(prof, 0.0, -600.0, 700.0, -100.0)
    assert bool(num.mask[0])
    s0 = float(num.s[0])
    np.testing.assert_allclose(_quad_advance(prof, s0, -600.0, -100.0),
                               700.0, rtol=2e-3)


def test_greenland_perturbation_profile():
    """The perturbation-layer profile (medium.py:294-316 counterpart) is
    traceable with the stratified solver; far from the layer it matches the
    unperturbed greenland_firn solutions."""
    from nuradiomc_tpu.models.ice_profiles import (greenland_firn,
                                                   greenland_perturbation)
    import jax.numpy as jnp

    from nuradiomc_tpu.ops import raytrace_numeric as rn

    # n(z): bump of the configured amplitude at the layer, monotone overall
    z = jnp.linspace(-200.0, -1.0, 4000)
    n_base = np.asarray(greenland_firn.index_of_refraction(z))
    n_pert = np.asarray(greenland_perturbation.index_of_refraction(z))
    dn = n_pert - n_base
    k = int(np.argmax(dn))
    assert abs(float(z[k]) - (-100.0)) < 1.0
    assert dn.max() == pytest.approx(greenland_perturbation.amplitude, rel=0.01)
    # still monotone through the layer region (solver requirement); the
    # firn segment boundary at -14.9 m has its own (base-profile) kink
    layer = (np.asarray(z) > -150.0) & (np.asarray(z) < -50.0)
    assert np.all(np.diff(n_pert[layer]) < 0)

    # deep geometry: the DIRECT ray never reaches the layer -> identical;
    # the refracted ray turns near the surface, crossing the layer twice ->
    # its travel time must differ (the layer acts only where crossed)
    sols_b = rn.find_solutions_numeric(greenland_firn, 0.0, -1500.0, 800.0, -400.0)
    sols_p = rn.find_solutions_numeric(greenland_perturbation, 0.0, -1500.0,
                                       800.0, -400.0)
    np.testing.assert_array_equal(np.asarray(sols_b.mask), np.asarray(sols_p.mask))
    direct = np.asarray(sols_b.mask) & (np.asarray(sols_b.sol_type) == 1)
    assert direct.any()
    # 1e-7: the two endpoints' fixed-K quadrature grids differ, so the
    # common above-layer path segment cancels only to grid accuracy
    np.testing.assert_allclose(np.asarray(sols_p.travel_time)[direct],
                               np.asarray(sols_b.travel_time)[direct], rtol=1e-7)
    crossing = np.asarray(sols_b.mask) & ~direct
    if crossing.any():
        assert np.any(np.abs(np.asarray(sols_p.travel_time)[crossing]
                             - np.asarray(sols_b.travel_time)[crossing]) > 1e-4)

    # shallow geometry crossing the layer: still solvable, finite, and the
    # travel time differs from the unperturbed profile (the layer acts)
    sols_b2 = rn.find_solutions_numeric(greenland_firn, 0.0, -150.0, 200.0, -80.0)
    sols_p2 = rn.find_solutions_numeric(greenland_perturbation, 0.0, -150.0,
                                        200.0, -80.0)
    m2 = np.asarray(sols_b2.mask) & np.asarray(sols_p2.mask)
    assert m2.any()
    tb = np.asarray(sols_b2.travel_time)[m2]
    tp = np.asarray(sols_p2.travel_time)[m2]
    assert np.all(np.isfinite(tp))
    assert np.any(np.abs(tp - tb) > 0)
