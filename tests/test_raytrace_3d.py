"""3D numerical ray tracer (arbitrary n(x, y, z) fields, ops/raytrace_3d.py)
validated against the analytic solver on stratified ice and exercised on a
genuinely 3D (horizontally varying) field the stratified solvers cannot
handle (the RadioPropa capability, radioproparaytracing.py:39-516)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuradiomc_tpu.models import ice as ice_models
from nuradiomc_tpu.ops import raytrace, raytrace_3d


ICE = ice_models.southpole_simple


def _n_stratified(x, y, z):
    return jnp.where(z > 0, 1.000293, ICE.index_of_refraction(z))


@pytest.mark.parametrize("src,rec", [
    ((600.0, 200.0, -800.0), (0.0, 0.0, -100.0)),
    ((1200.0, -300.0, -1500.0), (0.0, 0.0, -200.0)),
])
def test_matches_analytic_on_stratified_ice(src, rec):
    x1 = jnp.asarray(src, jnp.float64)
    x2 = jnp.asarray(rec, jnp.float64)

    sols3d = raytrace_3d.find_solutions_3d(_n_stratified, x1, x2,
                                           ds=1.0, n_steps=6000)
    geom = raytrace.to_2d(x1, x2)
    ana = raytrace.find_solutions(geom.x1y, geom.x1z, geom.x2y, geom.x2z, ICE)
    launch_ana, receive_ana = raytrace.launch_receive_vectors(geom, ana)

    m3 = np.asarray(sols3d.mask)
    ma = np.asarray(ana.mask)
    assert m3.sum() == ma.sum(), (m3, ma)

    # match solutions by launch zenith
    lz3 = np.sort(np.asarray(sols3d.launch_zenith)[m3])
    lz_a = np.sort(np.arccos(np.clip(np.asarray(launch_ana)[ma][:, 2], -1, 1)))
    np.testing.assert_allclose(lz3, lz_a, atol=2e-3)

    for field, ref_field, tol in ((sols3d.path_length, ana.path_length, 2e-3),
                                  (sols3d.travel_time, ana.travel_time, 2e-3)):
        got = np.sort(np.asarray(field)[m3])
        want = np.sort(np.asarray(ref_field)[ma])
        np.testing.assert_allclose(got, want, rtol=tol)


def test_reflected_solution_counts_surface_bounce():
    """A shallow geometry with a reflected solution: the 3D tracer reports
    the surface bounce the analytic solver classifies as SOL_REFLECTED."""
    x1 = jnp.asarray([700.0, 0.0, -300.0], jnp.float64)
    x2 = jnp.asarray([0.0, 0.0, -50.0], jnp.float64)
    sols3d = raytrace_3d.find_solutions_3d(_n_stratified, x1, x2,
                                           ds=1.0, n_steps=4000)
    geom = raytrace.to_2d(x1, x2)
    ana = raytrace.find_solutions(geom.x1y, geom.x1z, geom.x2y, geom.x2z, ICE)
    types = np.asarray(ana.sol_type)[np.asarray(ana.mask)]
    refl3 = np.asarray(sols3d.n_reflections)[np.asarray(sols3d.mask)]
    assert (types == raytrace.SOL_REFLECTED).sum() == (refl3 > 0).sum()


def test_genuinely_3d_field():
    """A horizontally varying field (Gaussian high-index blob offset from the
    propagation plane midpoint) — out of scope for every stratified solver.
    The tracer must find solutions, and Fermat consistency must hold: the
    travel time differs from the unperturbed stratified case by less than
    the blob's maximum optical-path perturbation, but by a nonzero amount
    when the ray passes near the blob."""
    def n_blob(x, y, z):
        base = jnp.where(z > 0, 1.000293, ICE.index_of_refraction(z))
        blob = 0.05 * jnp.exp(-(((x - 300.0) / 120.0) ** 2
                                + (y / 120.0) ** 2
                                + ((z + 450.0) / 120.0) ** 2))
        return base + jnp.where(z > 0, 0.0, blob)

    x1 = jnp.asarray([600.0, 0.0, -800.0], jnp.float64)
    x2 = jnp.asarray([0.0, 0.0, -100.0], jnp.float64)
    pert = raytrace_3d.find_solutions_3d(n_blob, x1, x2, ds=1.0, n_steps=4000)
    base = raytrace_3d.find_solutions_3d(_n_stratified, x1, x2,
                                         ds=1.0, n_steps=4000)
    mp, mb = np.asarray(pert.mask), np.asarray(base.mask)
    assert mp.sum() >= 1 and mb.sum() >= 1
    tp = np.sort(np.asarray(pert.travel_time)[mp])[0]
    tb = np.sort(np.asarray(base.travel_time)[mb])[0]
    # the direct ray passes within ~150 m of the blob center: the extra
    # optical path is bounded by dn * chord ~ 0.05 * 240 m / c ~ 40 ns
    assert 0.05 < abs(tp - tb) < 50.0, (tp, tb)
    assert np.isfinite(np.asarray(pert.launch_vector)[mp]).all()


def test_newton_refinement_out_of_plane():
    """A field with a LATERAL (y) gradient bends rays out of the
    source-receiver plane: the 2-parameter Newton polish must drive both the
    vertical and the lateral miss to ~zero (the in-plane solution alone
    carries a nonzero lateral miss)."""
    def n_tilted(x, y, z):
        base = jnp.where(z > 0, 1.000293, ICE.index_of_refraction(z))
        # gentle horizontal gradient in y (out-of-plane for this geometry)
        return base + jnp.where(z > 0, 0.0, 2e-5 * y)

    x1 = jnp.asarray([500.0, 0.0, -700.0], jnp.float64)
    x2 = jnp.asarray([0.0, 0.0, -100.0], jnp.float64)
    sols = raytrace_3d.find_solutions_3d(n_tilted, x1, x2, ds=1.0,
                                         n_steps=3000)
    m = np.asarray(sols.mask)
    assert m.sum() >= 1

    # lateral miss of the unrefined (in-plane) solution
    lat_before = []
    for k in np.where(m)[0]:
        miss, _ = raytrace_3d._miss2_of_angles(
            n_tilted, x1, x2, sols.launch_zenith[k], jnp.float64(0.0),
            1.0, 3000)
        lat_before.append(abs(float(miss[1])))
    assert max(lat_before) > 0.5          # the tilt really bends rays ~1 m

    refined, beta = raytrace_3d.refine_solutions_3d(
        n_tilted, x1, x2, sols, ds=1.0, n_steps=3000)
    mr = np.asarray(refined.mask)
    assert mr.sum() >= 1
    for k in np.where(mr)[0]:
        miss, _ = raytrace_3d._miss2_of_angles(
            n_tilted, x1, x2, refined.launch_zenith[k], beta[k], 1.0, 3000)
        assert abs(float(miss[0])) < 0.05, ("vertical", k, float(miss[0]))
        assert abs(float(miss[1])) < 0.05, ("lateral", k, float(miss[1]))
    # the refinement actually used the out-of-plane angle
    assert np.max(np.abs(np.asarray(beta)[mr])) > 1e-5
