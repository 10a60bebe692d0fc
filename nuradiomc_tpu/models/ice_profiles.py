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


PROFILES = {
    "greenland_firn": greenland_firn,
    "greenland_poly5": greenland_poly5,
}


def get_profile(name: str):
    if name not in PROFILES:
        raise NotImplementedError(f"ice profile {name} not implemented")
    return PROFILES[name]
