"""Birefringent pulse propagation (JAX).

Re-implementation of the analytic birefringence treatment of
NuRadioMC/SignalProp/analyticraytracing.py: effective refractive indices from
the diagonalized dielectric tensor (get_effective_index_birefringence:
2165-2210), polarization eigenvectors (get_polarization_birefringence_simple:
2212-2243), and the per-meter path scan that rotates (eTheta, ePhi) into the
birefringent eigenbasis, applies the fast/slow relative Fourier time shift
and rotates back (get_pulse_propagation_birefringence:2369-2445).

The spline-interpolated (nx, ny, nz)(z) models (utilities/medium_base.py:
378-421, data in utilities/birefringence_models/*.npy) are densified on the
host into regular tables evaluated with jnp.interp; the path scan is a
jax.lax.scan over a fixed number of segments, vmappable over solutions.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from nuradiomc_tpu.models.ice import IceModelSimple
from nuradiomc_tpu.ops import raytrace
from nuradiomc_tpu.utils import geometry
from nuradiomc_tpu.utils.constants import speed_of_light

_MODEL_DIR_CANDIDATES = (
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "data", "birefringence_models"),
    "/root/reference/NuRadioMC/utilities/birefringence_models",
)


@functools.lru_cache(maxsize=8)
def load_model(name: str = "southpole_A", n_depth: int = 2501):
    """(depths[m positive], nx, ny, nz) dense tables from the spline model."""
    from scipy import interpolate

    path = None
    for d in _MODEL_DIR_CANDIDATES:
        cand = os.path.join(d, f"birefringence_{name}.npy")
        if os.path.exists(cand):
            path = cand
            break
    if path is None:
        raise FileNotFoundError(f"birefringence model {name} not found")
    tck = np.load(path, allow_pickle=True)
    f1 = interpolate.UnivariateSpline._from_tck(tck[0])
    f2 = interpolate.UnivariateSpline._from_tck(tck[1])
    f3 = interpolate.UnivariateSpline._from_tck(tck[2])
    depths = np.linspace(0.0, 2500.0, n_depth)
    return (depths, f1(depths), f2(depths), f3(depths))


def effective_indices(direction, nx, ny, nz):
    """(n1, n2) effective indices (get_effective_index_birefringence:2165-2210)."""
    sx, sy, sz = direction[..., 0], direction[..., 1], direction[..., 2]
    A = (ny ** 2 * nz ** 2 * (sx ** 2 - 1)
         + nx ** 2 * (nz ** 2 * (sy ** 2 - 1) + ny ** 2 * (sz ** 2 - 1)))
    disc = jnp.sqrt(jnp.maximum(
        4 * nx ** 2 * ny ** 2 * nz ** 2 * (
            nz ** 2 * (sx ** 2 + sy ** 2 - 1)
            + ny ** 2 * (sx ** 2 + sz ** 2 - 1)
            + nx ** 2 * (sy ** 2 + sz ** 2 - 1)) + A ** 2, 0.0))
    num = -2 * nx ** 2 * ny ** 2 * nz ** 2
    n1 = jnp.sqrt(num / (A - disc))
    n2 = jnp.sqrt(num / (A + disc))
    return n1, n2


def polarization_onsky(n_eff, direction, nx, ny, nz, eps=0.0):
    """Normalized polarization eigenvector projected on (eTheta, ePhi)
    (get_polarization_birefringence_simple:2212-2243 + on-sky projection)."""
    d = jnp.stack([direction[..., 0] / (n_eff ** 2 - nx ** 2 + eps),
                   direction[..., 1] / (n_eff ** 2 - ny ** 2 + eps),
                   direction[..., 2] / (n_eff ** 2 - nz ** 2 + eps)], axis=-1)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-30)
    zen, az = geometry.cartesian_to_spherical(direction)
    onsky = geometry.ground_to_onsky(d, zen, az)
    return onsky[..., 1], onsky[..., 2]  # (theta, phi) components


def path_points_3d(c0, geom: raytrace.Geometry2D, ice: IceModelSimple,
                   n_points: int, iceflow_angle: float = 0.0):
    """3D sample points along a ray solution (get_path:2060-2116 + the
    ice-flow rotation of get_pulse_propagation_birefringence:2405-2408)."""
    z2m = raytrace._z2_mirrored(c0, geom.x1y, geom.x1z, geom.x2y, geom.x2z, ice)
    _, z_turn = raytrace._turning_point(c0, ice)
    c1 = raytrace._c1_of(geom.x1y, geom.x1z, c0, ice)

    zm = jnp.linspace(geom.x1z, z2m, n_points)
    below = zm < z_turn
    y_below = raytrace._y_of_gamma(raytrace._gamma(zm, ice), c0, c1, ice)
    y_turn = raytrace._y_of_gamma(raytrace._gamma(z_turn, ice), c0, c1, ice)
    y_above = 2 * y_turn - raytrace._y_of_gamma(
        raytrace._gamma(2 * z_turn - zm, ice), c0, c1, ice)
    y = jnp.where(below, y_below, y_above)
    z = jnp.where(below, zm, 2 * z_turn - zm)

    # into 3D: horizontal direction (ux, uy) from the 2D reduction
    dx = (y - geom.x1y)
    px = geom.ux * dx
    py = geom.uy * dx
    # rotate x,y by the ice-flow angle
    ca, sa = jnp.cos(iceflow_angle), jnp.sin(iceflow_angle)
    x_rot = ca * px - sa * py
    y_rot = sa * px + ca * py
    return jnp.stack([x_rot, y_rot, z], axis=-1)  # [n_points, 3]


def propagate_pulse(spec_theta, spec_phi, path_xyz, frequencies,
                    ice: IceModelSimple, model: str = "southpole_A"):
    """Propagate (eTheta(f), ePhi(f)) along the path with per-segment
    birefringent eigenbasis rotations and relative time shifts
    (get_pulse_propagation_birefringence:2369-2445).

    path_xyz: [K, 3] points; returns propagated (spec_theta, spec_phi).
    """
    depths, bx, by, bz = load_model(model)
    depths = jnp.asarray(depths)
    bx, by, bz = jnp.asarray(bx), jnp.asarray(by), jnp.asarray(bz)

    p0 = path_xyz[:-1]
    p1 = path_xyz[1:]
    d_vec = p1 - p0
    seg_len = jnp.linalg.norm(d_vec, axis=-1)
    direction = d_vec / jnp.maximum(seg_len[:, None], 1e-30)

    n_iso = ice.index_of_refraction(p0[:, 2])
    depth_pos = -p0[:, 2]
    nx = n_iso + jnp.interp(depth_pos, depths, bx) - 1.78
    ny = n_iso + jnp.interp(depth_pos, depths, by) - 1.78
    nz = n_iso + jnp.interp(depth_pos, depths, bz) - 1.78

    n1, n2 = effective_indices(direction, nx, ny, nz)
    a, b = polarization_onsky(n1, direction, nx, ny, nz)
    c, d = polarization_onsky(n2, direction, nx, ny, nz)
    dt_rel = seg_len * (n2 - n1) / speed_of_light   # t_1 - t_0 (slow - fast)

    det = a * d - b * c
    ok = (jnp.abs(det) > 1e-6) & jnp.isfinite(det) & \
        jnp.isfinite(a) & jnp.isfinite(b) & jnp.isfinite(c) & jnp.isfinite(d)

    phase = jnp.exp(-2j * jnp.pi * frequencies[None, :] * dt_rel[:, None])

    def seg(carry, xs):
        st, sp = carry
        aa, bb, cc, dd, ph, valid = xs
        b0 = aa * st + bb * sp
        b1 = cc * st + dd * sp
        b1 = b1 * ph
        st_new = aa * b0 + cc * b1
        sp_new = bb * b0 + dd * b1
        st = jnp.where(valid, st_new, st)
        sp = jnp.where(valid, sp_new, sp)
        return (st, sp), None

    (out_t, out_p), _ = jax.lax.scan(
        seg, (spec_theta, spec_phi), (a, b, c, d, phase, ok))
    return out_t, out_p
