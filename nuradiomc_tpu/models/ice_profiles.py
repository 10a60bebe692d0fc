"""Stratified ice profiles beyond the single exponential.

Counterparts of the reference models that require the external RadioPropa
package (utilities/medium.py): greenland_firn (:156-293, double exponential),
greenland_poly5 (:318-338, exponential-polynomial density fit), and
perturbation-style profiles.  Here they are plain n(z) callables consumed by
the numerical stratified tracer (ops/raytrace_numeric.py) — no external
propagation engine needed.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from nuradiomc_tpu.utils import units


@dataclasses.dataclass(frozen=True)
class FirnIceModel:
    """Piecewise multi-exponential profile: in segment k (z <= z_top[k]),
    n(z) = n_ice[k] - delta_n[k] * exp((z - z_shift[k]) / z_0[k]).

    greenland_firn (medium.py:156-293): two segments, continuous at z_firn.
    """

    z_tops: tuple          # segment upper boundaries, descending; first = 0
    n_ice: tuple
    delta_n: tuple
    z_0: tuple
    z_shift: tuple
    z_bottom: float = -3000.0 * units.m

    def index_of_refraction(self, z):
        import jax.numpy as jnp
        z = jnp.asarray(z)
        seg = jnp.zeros(z.shape, dtype=jnp.int32)
        for k, zt in enumerate(self.z_tops[1:], start=1):
            seg = jnp.where(z <= zt, k, seg)
        n = jnp.ones_like(z)
        for k in range(len(self.z_tops)):
            nk = (self.n_ice[k] - self.delta_n[k]
                  * jnp.exp((z - self.z_shift[k]) / self.z_0[k]))
            n = jnp.where(seg == k, nk, n)
        return jnp.where(z > 0, 1.0, n)


@dataclasses.dataclass(frozen=True)
class ExponentialPolynomialIceModel:
    """n(z) = 1 + density_factor * sum_i a_i exp(i (z - z_shift)/z_0)
    (medium_base.IceModelExponentialPolynomial:424-501)."""

    a: tuple
    z_0: float
    density_factor: float
    z_shift: float = 0.0
    z_bottom: float = -3000.0 * units.m

    def index_of_refraction(self, z):
        import jax.numpy as jnp
        z = jnp.asarray(z)
        x = jnp.exp((z - self.z_shift) / self.z_0)
        rho = jnp.zeros_like(x)
        for i, ai in enumerate(self.a):
            rho = rho + ai * x ** i
        return jnp.where(z > 0, 1.0, 1.0 + rho * self.density_factor)


# double exponential at Summit, Greenland (medium.py:203-216)
greenland_firn = FirnIceModel(
    z_tops=(0.0, -14.9 * units.m),
    n_ice=(1.78, 1.78),
    delta_n=(0.502, 0.310),
    z_0=(30.8 * units.m, 40.9 * units.m),
    z_shift=(0.0, -14.9 * units.m),
)

# fifth-degree exponential polynomial at Summit (medium.py:318-338)
greenland_poly5 = ExponentialPolynomialIceModel(
    a=tuple(np.array([917, -62.2, 1177, -9051, 14360, -7024])
            * (units.kg / units.m ** 3)),
    z_0=74.6 * units.m,
    density_factor=0.851 * (units.cm ** 3 / units.gram),
)


@dataclasses.dataclass(frozen=True)
class PerturbedIceModel:
    """A stratified base profile with a localized horizontal perturbation
    layer: n(z) = n_base(z) + fraction * dn(z), a Gaussian bump of the given
    width centered at z_center.

    Counterpart of the reference's ``greenland_perturbation``
    (medium.py:294-316), whose layer comes from the external radiopropa
    package's ``PerturbationHorizontal(-100 m, 2 m, fraction=1)`` module
    (arXiv:1805.12576 table IV). radiopropa is not available in this
    environment, so the exact functional form of its perturbation cannot be
    cross-checked; this class implements the documented physics — a
    horizontal layer at -100 m with 2 m width where the refractive index is
    locally perturbed — with a configurable amplitude. Rays through the
    layer bend/reflect according to the stratified solver; arbitrary
    NON-stratified 3D fields remain out of scope (radioproparaytracing.py:39).

    The default amplitude keeps n(z) monotone (bump slope below the base
    profile's slope at the layer depth), which the two-branch bisection
    solver requires; larger amplitudes create a ducting channel (multiple
    turning depths) that needs a dense path integrator instead.
    """

    base: object                      # profile with index_of_refraction(z)
    z_center: float = -100.0 * units.m
    width: float = 2.0 * units.m
    fraction: float = 1.0
    amplitude: float = 0.001          # peak dn of the layer
    z_bottom: float = -3000.0 * units.m

    def index_of_refraction(self, z):
        import jax.numpy as jnp
        z = jnp.asarray(z)
        n = self.base.index_of_refraction(z)
        bump = self.fraction * self.amplitude * jnp.exp(
            -0.5 * ((z - self.z_center) / self.width) ** 2)
        return jnp.where(z > 0, 1.0, n + bump)


greenland_perturbation = PerturbedIceModel(base=greenland_firn)


PROFILES = {
    "greenland_firn": greenland_firn,
    "greenland_poly5": greenland_poly5,
    "greenland_perturbation": greenland_perturbation,
}


def get_profile(name: str):
    if name not in PROFILES:
        raise NotImplementedError(f"ice profile {name} not implemented")
    return PROFILES[name]
