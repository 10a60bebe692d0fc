"""Numerical ray tracing through ARBITRARY 3D refractive-index fields (JAX).

Counterpart of the reference's RadioPropa path
(NuRadioMC/SignalProp/radioproparaytracing.py:39-516): the external C++
propagation engine is replaced by a fixed-step RK4 integration of the ray
(eikonal) equations

    dx/ds = p / n,      dp/ds = grad n        (|p| = n along a true ray)

with `grad n` from automatic differentiation of the user's field — any
differentiable ``n(x, y, z)`` works, including horizontally varying media
the stratified solvers cannot handle.

Two-point solving mirrors the reference's iterative angular search
(radioproparaytracing.py: launch-zenith scan in the vertical plane through
source and receiver + shrinking windows): a vmapped fan of launch zeniths
integrates in one `lax.scan`, the signed vertical miss at the receiver's
horizontal distance is recorded per ray, sign changes bracket solutions, and
a fixed-iteration bisection refines each bracket. Everything is fixed-shape
and jit/vmap-friendly; up to ``n_slots`` solutions carry a validity mask.

The 1-parameter in-plane search is followed (optionally, `refine_3d=True`)
by a 2-parameter Newton polish over (launch zenith, out-of-plane azimuth)
with the 2x2 Jacobian of the (vertical, lateral) miss from forward-mode
autodiff THROUGH the RK4 scan — so media whose horizontal gradients push
rays out of the source-receiver plane converge to exact 3D solutions.
Solutions requiring a launch azimuth far outside the fan's basin remain out
of scope (a full cone scan would be the extension). The surface (z=0) acts
as a perfect mirror for upgoing rays, matching the analytic solver's
treatment of in-ice propagation.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from nuradiomc_tpu.utils.constants import speed_of_light


class Ray3DSolutions(NamedTuple):
    mask: jnp.ndarray           # [n_slots]
    launch_zenith: jnp.ndarray  # [n_slots] in-plane launch zenith (rad)
    launch_vector: jnp.ndarray  # [n_slots, 3]
    receive_vector: jnp.ndarray # [n_slots, 3]
    path_length: jnp.ndarray    # [n_slots]
    travel_time: jnp.ndarray    # [n_slots]
    n_reflections: jnp.ndarray  # [n_slots] surface bounces


def _plane_basis(x1, x2):
    """(u, origin, d_h): unit horizontal direction from x1 toward x2."""
    d = x2 - x1
    d_h = jnp.sqrt(d[0] ** 2 + d[1] ** 2)
    safe = jnp.maximum(d_h, 1e-12)
    u = jnp.array([d[0] / safe, d[1] / safe, 0.0])
    u = jnp.where(d_h > 1e-9, u, jnp.array([1.0, 0.0, 0.0]))
    return u, x1, d_h


def shoot_ray(n_field: Callable, x0, p0, ds: float, n_steps: int,
              d_h_target, u=None, v=None):
    """Integrate one ray; returns the crossing record at horizontal distance
    ``d_h_target`` from x0 (the along-track horizontal advance; when a plane
    basis (u, v) is given, the advance is the u-projection and the record
    carries the lateral v-offset at the crossing).

    State: (position[3], momentum p = n * direction[3]).  The surface z=0
    mirrors upgoing rays (perfect reflection).  The scan also accumulates
    path length and optical time, freezing them once the crossing has
    happened so the recorded observables refer to the receiver distance.
    """
    grad_n = jax.grad(lambda x: n_field(x[0], x[1], x[2]))

    def rhs(x, p):
        n = n_field(x[0], x[1], x[2])
        return p / n, grad_n(x)

    if u is None:
        def horiz(x):
            d = x - x0
            return jnp.sqrt(d[0] ** 2 + d[1] ** 2)

        def lateral(x):
            return jnp.asarray(0.0, x0.dtype)
    else:
        def horiz(x):
            d = x - x0
            return d[0] * u[0] + d[1] * u[1]

        def lateral(x):
            d = x - x0
            return d[0] * v[0] + d[1] * v[1]

    def step(carry, _):
        x, p, s_acc, t_acc, crossed, rec, n_refl = carry
        # RK4 in arc length
        k1x, k1p = rhs(x, p)
        k2x, k2p = rhs(x + 0.5 * ds * k1x, p + 0.5 * ds * k1p)
        k3x, k3p = rhs(x + 0.5 * ds * k2x, p + 0.5 * ds * k2p)
        k4x, k4p = rhs(x + ds * k3x, p + ds * k3p)
        x_new = x + ds / 6.0 * (k1x + 2 * k2x + 2 * k3x + k4x)
        p_new = p + ds / 6.0 * (k1p + 2 * k2p + 2 * k3p + k4p)

        # surface mirror for upgoing rays
        hit_surface = (x_new[2] > 0.0) & (p_new[2] > 0.0)
        x_new = jnp.where(hit_surface,
                          x_new.at[2].set(-x_new[2]), x_new)
        p_new = jnp.where(hit_surface, p_new.at[2].set(-p_new[2]), p_new)
        n_refl = n_refl + hit_surface.astype(jnp.int32)

        n_here = n_field(x[0], x[1], x[2])
        s_new = s_acc + ds
        t_new = t_acc + ds * n_here / speed_of_light

        d0 = horiz(x)
        d1 = horiz(x_new)
        crossing_now = (~crossed) & (d1 >= d_h_target) & (d1 > d0)
        # linear interpolation inside the step for the crossing record
        f = jnp.where(crossing_now,
                      (d_h_target - d0) / jnp.maximum(d1 - d0, 1e-12), 0.0)
        z_cross = x[2] + f * (x_new[2] - x[2])
        lat_cross = lateral(x) + f * (lateral(x_new) - lateral(x))
        rec_new = {
            "z": jnp.where(crossing_now, z_cross, rec["z"]),
            "lat": jnp.where(crossing_now, lat_cross, rec["lat"]),
            "s": jnp.where(crossing_now, s_acc + f * ds, rec["s"]),
            "t": jnp.where(crossing_now,
                           t_acc + f * ds * n_here / speed_of_light, rec["t"]),
            "p": jnp.where(crossing_now, p, rec["p"]),
            "n_refl": jnp.where(crossing_now, n_refl, rec["n_refl"]),
        }
        crossed = crossed | crossing_now
        return (x_new, p_new, s_new, t_new, crossed, rec_new, n_refl), None

    n0 = n_field(x0[0], x0[1], x0[2])
    rec0 = {"z": jnp.asarray(jnp.nan, x0.dtype),
            "lat": jnp.asarray(0.0, x0.dtype),
            "s": jnp.asarray(0.0, x0.dtype),
            "t": jnp.asarray(0.0, x0.dtype),
            "p": p0, "n_refl": jnp.asarray(0, jnp.int32)}
    carry = (x0, p0 * (n0 / jnp.linalg.norm(p0)), jnp.asarray(0.0, x0.dtype),
             jnp.asarray(0.0, x0.dtype), jnp.asarray(False), rec0,
             jnp.asarray(0, jnp.int32))
    (x, p, s, t, crossed, rec, n_refl), _ = jax.lax.scan(
        step, carry, None, length=n_steps)
    return crossed, rec


def _miss_of_zenith(n_field, x1, x2, zenith, ds, n_steps):
    """Signed vertical miss z(ray @ receiver distance) - z2 for an in-plane
    launch zenith; NaN when the ray never reaches the distance."""
    u, _, d_h = _plane_basis(x1, x2)
    direction = jnp.array([u[0] * jnp.sin(zenith), u[1] * jnp.sin(zenith),
                           jnp.cos(zenith)])
    crossed, rec = shoot_ray(n_field, x1, direction, ds, n_steps, d_h)
    return jnp.where(crossed, rec["z"] - x2[2], jnp.nan), rec


def _miss2_of_angles(n_field, x1, x2, zen, beta, ds, n_steps):
    """(vertical, lateral) miss for launch angles (zenith, out-of-plane
    azimuth beta) — the 2D objective of the Newton polish."""
    u, _, d_h = _plane_basis(x1, x2)
    v = jnp.array([-u[1], u[0], 0.0])
    h = jnp.sin(zen)
    direction = jnp.array([
        h * (u[0] * jnp.cos(beta) + v[0] * jnp.sin(beta)),
        h * (u[1] * jnp.cos(beta) + v[1] * jnp.sin(beta)),
        jnp.cos(zen)])
    crossed, rec = shoot_ray(n_field, x1, direction, ds, n_steps, d_h,
                             u=u, v=v)
    miss = jnp.stack([rec["z"] - x2[2], rec["lat"]])
    return jnp.where(crossed, miss, jnp.nan), rec


def refine_solutions_3d(n_field: Callable, x1, x2, sols: Ray3DSolutions,
                        ds: float = 2.0, n_steps: int = 4000,
                        n_newton: int = 6, damping: float = 0.7):
    """Newton-polish in-plane solutions over (zenith, out-of-plane azimuth)
    for media with horizontal gradients: the 2x2 Jacobian of the
    (vertical, lateral) miss comes from forward-mode autodiff THROUGH the
    RK4 integration. Returns (refined Ray3DSolutions, beta[n_slots])."""
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)

    def miss2(angles):
        m, _ = _miss2_of_angles(n_field, x1, x2, angles[0], angles[1],
                                ds, n_steps)
        return m

    jac = jax.jacfwd(miss2)

    def newton_one(zen0):
        def body(_, a):
            m = miss2(a)
            J = jac(a)
            delta = jnp.linalg.solve(
                J + 1e-12 * jnp.eye(2, dtype=a.dtype), m)
            a_new = a - damping * delta
            ok = jnp.all(jnp.isfinite(a_new)) & jnp.all(jnp.isfinite(m))
            return jnp.where(ok, a_new, a)
        return jax.lax.fori_loop(
            0, n_newton, body,
            jnp.stack([zen0, jnp.asarray(0.0, zen0.dtype)]))

    angles = jax.vmap(newton_one)(sols.launch_zenith)

    def observables(a):
        miss, rec = _miss2_of_angles(n_field, x1, x2, a[0], a[1], ds, n_steps)
        u, _, _ = _plane_basis(x1, x2)
        v = jnp.array([-u[1], u[0], 0.0])
        h = jnp.sin(a[0])
        launch = jnp.array([
            h * (u[0] * jnp.cos(a[1]) + v[0] * jnp.sin(a[1])),
            h * (u[1] * jnp.cos(a[1]) + v[1] * jnp.sin(a[1])),
            jnp.cos(a[0])])
        p = rec["p"]
        receive = p / jnp.maximum(jnp.linalg.norm(p), 1e-30)
        return miss, launch, receive, rec["s"], rec["t"], rec["n_refl"]

    miss, launch, receive, s, t, n_refl = jax.vmap(observables)(angles)
    mask = sols.mask & jnp.all(jnp.isfinite(miss), axis=-1)
    return Ray3DSolutions(
        mask=mask, launch_zenith=angles[:, 0], launch_vector=launch,
        receive_vector=receive, path_length=s, travel_time=t,
        n_reflections=n_refl), angles[:, 1]


def find_solutions_3d(n_field: Callable, x1, x2, n_slots: int = 4,
                      n_fan: int = 90, n_bisect: int = 30,
                      ds: float = 2.0, n_steps: int = 4000) -> Ray3DSolutions:
    """Two-point solutions through an arbitrary 3D field.

    Parameters mirror the reference's iterative ray tracer configuration
    (radioproparaytracing.py 'iterative ray tracing settings'): a coarse fan
    of ``n_fan`` launch zeniths brackets sign changes of the vertical miss,
    and each bracket is refined with ``n_bisect`` bisection steps.
    """
    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    dtype = x1.dtype

    zeniths = jnp.linspace(0.02, jnp.pi - 0.02, n_fan).astype(dtype)
    miss_fan, _ = jax.vmap(
        lambda th: _miss_of_zenith(n_field, x1, x2, th, ds, n_steps))(zeniths)

    # sign-change brackets (NaN-safe): valid consecutive pairs with opposite
    # signs; take the first n_slots
    ok = jnp.isfinite(miss_fan[:-1]) & jnp.isfinite(miss_fan[1:])
    sign_change = ok & (jnp.sign(miss_fan[:-1]) != jnp.sign(miss_fan[1:]))
    # rank brackets by fan index, mask out non-brackets
    idx = jnp.arange(n_fan - 1)
    order = jnp.argsort(jnp.where(sign_change, idx, n_fan + idx))
    slots = order[:n_slots]
    slot_valid = sign_change[slots]

    lo = zeniths[slots]
    hi = zeniths[slots + 1]
    f_lo = miss_fan[slots]

    def bisect_one(lo, hi, f_lo):
        def body(_, st):
            lo_, hi_ = st
            mid = 0.5 * (lo_ + hi_)
            f_mid, _ = _miss_of_zenith(n_field, x1, x2, mid, ds, n_steps)
            same = jnp.sign(f_mid) == jnp.sign(f_lo)
            return jnp.where(same, mid, lo_), jnp.where(same, hi_, mid)
        lo_, hi_ = jax.lax.fori_loop(0, n_bisect, body, (lo, hi))
        return 0.5 * (lo_ + hi_)

    zen_sol = jax.vmap(bisect_one)(lo, hi, f_lo)

    def observables(zen):
        miss, rec = _miss_of_zenith(n_field, x1, x2, zen, ds, n_steps)
        u, _, _ = _plane_basis(x1, x2)
        launch = jnp.array([u[0] * jnp.sin(zen), u[1] * jnp.sin(zen),
                            jnp.cos(zen)])
        p = rec["p"]
        receive = p / jnp.maximum(jnp.linalg.norm(p), 1e-30)
        return miss, launch, receive, rec["s"], rec["t"], rec["n_refl"]

    miss, launch, receive, s, t, n_refl = jax.vmap(observables)(zen_sol)
    mask = slot_valid & jnp.isfinite(miss)
    return Ray3DSolutions(
        mask=mask, launch_zenith=zen_sol, launch_vector=launch,
        receive_vector=receive, path_length=s, travel_time=t,
        n_reflections=n_refl)
