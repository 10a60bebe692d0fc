"""Layered atmosphere model + refractivity for air-shower reconstruction.

Independent implementation of the functionality the reference pulls from the
external `radiotools.atmosphere` package (used by
NuRadioReco/modules/efieldRadioInterferometricReconstruction.py): Linsley
5-layer parameterizations X_v(h) = a_i + b_i exp(-h/c_i), curved-Earth slant
depth along an axis, and the integrated refractivity between two points
(Gladstone-Dale scaling N(h) = N0 * rho(h)/rho(0)).

All heights in internal units (meters); mass overburden in g/cm^2 as is
conventional for shower physics.
"""

from __future__ import annotations

import numpy as np

from nuradiomc_tpu.utils import units

R_EARTH = 6.371e6 * units.m

# Linsley parameterizations: layer boundaries [m], a,b [g/cm^2], c [cm].
# Model 1: US standard atmosphere (CORSIKA builtin); model 17: US standard
# after Keilhauer (the common radiotools default).
ATM_MODELS = {
    1: {
        "h": np.array([0.0, 4e3, 1e4, 4e4, 1e5]),
        "a": np.array([-186.555305, -94.919, 0.61289, 0.0, 0.01128292]),
        "b": np.array([1222.6562, 1144.9069, 1305.5948, 540.1778, 1.0]),
        "c": np.array([994186.38, 878153.55, 636143.04, 772170.16, 1e9]),
    },
    17: {
        "h": np.array([0.0, 7e3, 11.4e3, 37e3, 1e5]),
        "a": np.array([-149.801663, -57.932486, 0.63631894, 4.35453690e-4,
                       0.01128292]),
        "b": np.array([1183.6071, 1143.0425, 1322.9748, 655.67307, 1.0]),
        "c": np.array([954248.34, 800005.34, 629568.93, 737521.77, 1e9]),
    },
}

M_TO_CM = 100.0


class Atmosphere:
    """Linsley atmosphere with curved-Earth slant-depth integrals."""

    def __init__(self, model=17, n_taylor=5, curved=True):
        if model not in ATM_MODELS:
            raise ValueError(f"unknown atmosphere model {model}")
        self.model = model
        p = ATM_MODELS[model]
        self._hb = p["h"]
        self._a, self._b, self._c = p["a"], p["b"], p["c"]
        # top of the atmosphere: X_v = 0 in the linear layer
        self.h_max = self._a[4] * self._c[4] / self._b[4] / M_TO_CM

    def _layer(self, h):
        return np.clip(np.searchsorted(self._hb, h, side="right") - 1, 0, 4)

    def get_vertical_depth(self, h):
        """Vertical mass overburden X_v(h) in g/cm^2 (h in m)."""
        h = np.asarray(h, dtype=float)
        i = self._layer(h)
        h_cm = h * M_TO_CM
        exp_part = self._a[i] + self._b[i] * np.exp(-h_cm / self._c[i])
        lin_part = self._a[4] - self._b[4] * h_cm / self._c[4]
        out = np.where(i < 4, exp_part, lin_part)
        return np.where(h >= self.h_max, 0.0, out)

    def get_density(self, h):
        """rho(h) in g/cm^3."""
        h = np.asarray(h, dtype=float)
        i = self._layer(h)
        h_cm = h * M_TO_CM
        rho = np.where(i < 4, self._b[i] / self._c[i] * np.exp(-h_cm / self._c[i]),
                       self._b[4] / self._c[4])
        return np.where(h >= self.h_max, 0.0, rho)

    def get_vertical_height(self, X):
        """Inverse of get_vertical_depth (X in g/cm^2, returns m)."""
        X = np.asarray(X, dtype=float)
        # piecewise analytic inverse
        X_bounds = self.get_vertical_depth(self._hb)
        out = np.empty_like(X)
        i = np.clip(np.searchsorted(-X_bounds, -X, side="right") - 1, 0, 4)
        exp_h = -self._c[i] * np.log(np.maximum((X - self._a[i]) / self._b[i],
                                                1e-300)) / M_TO_CM
        lin_h = (self._a[4] - X) * self._c[4] / self._b[4] / M_TO_CM
        out = np.where(i < 4, exp_h, lin_h)
        return np.where(X <= 0, self.h_max, out)

    # ---- curved geometry helpers ------------------------------------

    @staticmethod
    def height_at_distance(d, zenith, observation_level=0.0):
        """Height above sea level after travelling distance d from the
        observation level along a direction with zenith angle ``zenith``
        (curved Earth)."""
        r0 = R_EARTH + observation_level
        r = np.sqrt(r0 ** 2 + np.asarray(d) ** 2
                    + 2 * r0 * np.asarray(d) * np.cos(zenith))
        return r - R_EARTH

    def _distance_grid(self, zenith, observation_level, n=4096):
        # distance to the top of the atmosphere along the axis
        r0 = R_EARTH + observation_level
        rt = R_EARTH + self.h_max
        d_top = (np.sqrt(rt ** 2 - r0 ** 2 * np.sin(zenith) ** 2)
                 - r0 * np.cos(zenith))
        return np.linspace(0.0, d_top, n)

    def get_slant_depth_at_distance(self, d, zenith, observation_level=0.0):
        """Slant depth X(d): overburden along the axis from the top of the
        atmosphere down to distance d from the observation level (g/cm^2),
        curved-Earth numeric integral."""
        grid = self._distance_grid(zenith, observation_level)
        rho = self.get_density(self.height_at_distance(grid, zenith,
                                                       observation_level))
        # integral from s to d_top of rho ds  (ds in cm)
        cum = np.concatenate([
            [0.0], np.cumsum(0.5 * (rho[1:] + rho[:-1]) * np.diff(grid))
        ]) * M_TO_CM
        X_of_d = cum[-1] - np.interp(d, grid, cum)
        return X_of_d

    def get_distance_xmax_geometric(self, zenith, x_max,
                                    observation_level=0.0):
        """Geometric distance from the observation level (along the axis) of
        the point with slant depth ``x_max`` (radiotools
        Atmosphere.get_distance_xmax_geometric equivalent)."""
        grid = self._distance_grid(zenith, observation_level)
        X = self.get_slant_depth_at_distance(grid, zenith, observation_level)
        # X decreases with d; invert by interpolation
        x_max = np.asarray(x_max, dtype=float)
        if np.any(x_max > X[0]) or np.any(x_max < 0):
            raise ValueError("requested depth outside the atmosphere")
        return np.interp(-x_max, -X, grid)


class Refractivity:
    """Gladstone-Dale refractivity N(h) = N0 rho(h)/rho(0) + straight-line
    effective refractivity between two points (radiotools
    RefractivityTable.get_refractivity_between_two_points equivalent,
    evaluated by direct vectorized integration instead of a cached table)."""

    def __init__(self, atmosphere: Atmosphere, n0=1.000292, n_samples=512):
        self.at = atmosphere
        self.refractivity_at_sea_level = n0 - 1.0
        self._rho0 = float(atmosphere.get_density(0.0))
        self._n = n_samples

    def refractivity(self, h):
        return (self.refractivity_at_sea_level
                * self.at.get_density(h) / self._rho0)

    def effective_refractivity(self, p1, p2):
        """Average N along the straight line p1 -> p2.

        p1: (3,) source point; p2: (..., 3) observers (vectorized).
        Heights are curved-Earth heights above sea level.
        """
        p1 = np.asarray(p1, dtype=float)
        p2 = np.atleast_2d(np.asarray(p2, dtype=float))
        t = np.linspace(0.0, 1.0, self._n)
        pts = p1[None, None, :] + t[None, :, None] * (p2[:, None, :] - p1[None, None, :])
        r = np.sqrt(pts[..., 0] ** 2 + pts[..., 1] ** 2
                    + (pts[..., 2] + R_EARTH) ** 2)
        N = self.refractivity(r - R_EARTH)
        return np.trapezoid(N, t, axis=-1)

    def time_delay(self, target, positions, speed_of_light):
        """Light travel time source -> each observer including refractivity
        (interferometry.get_time_shifts_rit:189-221)."""
        positions = np.atleast_2d(np.asarray(positions, dtype=float))
        dist = np.linalg.norm(positions - np.asarray(target), axis=-1)
        n_eff = 1.0 + self.effective_refractivity(target, positions)
        return dist * n_eff / speed_of_light
