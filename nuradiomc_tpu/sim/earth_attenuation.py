"""Neutrino survival weights through the Earth (host-side numpy, vectorized).

Re-implementation of NuRadioMC/utilities/earth_attenuation.py: the 'simple'
constant-density model (:63-87) and the three-layer
'core_mantle_crust_simple' model with ARAsim 2018 parameters (:90-129),
fully vectorized over events (the reference evaluates per event).
"""

from __future__ import annotations

import numpy as np

from nuradiomc_tpu.sim import cross_sections
from nuradiomc_tpu.utils import units

AMU = 1.66e-27 * units.kg


def get_simple_weight(theta_nu, pnu, cross_section_type="ctw"):
    """Constant-density crust, interaction at the surface (:63-87)."""
    theta_nu = np.asarray(theta_nu, dtype=float)
    pnu = np.asarray(pnu, dtype=float)
    R_earth = 6357390 * units.m
    rho = 2900 * units.kg / units.m ** 3
    sigma = cross_sections.get_nu_cross_section(
        pnu, np.zeros_like(pnu, dtype=int), cross_section_type=cross_section_type)
    d = -2 * R_earth * np.cos(theta_nu)
    w = np.exp(-d * sigma * rho / AMU)
    return np.where(theta_nu <= 0.5 * np.pi, 1.0, w)


def get_core_mantle_crust_simple_weight(theta_nu, pnu, flavors,
                                        cross_section_type="ctw"):
    """Three-layer Earth, interaction at the surface (:90-129)."""
    theta_nu = np.asarray(theta_nu, dtype=float)
    pnu = np.asarray(pnu, dtype=float)
    R_EARTH = 6.378140e6 * units.m
    densities = np.array([14000.0, 3400.0, 2900.0]) * units.kg / units.m ** 3
    radii = np.array([3.46e6 * units.m, R_EARTH - 4.0e4 * units.m, R_EARTH])

    sigma = cross_sections.get_nu_cross_section(
        pnu, flavors, cross_section_type=cross_section_type)

    sin_t = np.sin(np.pi - theta_nu)
    cos_t = np.cos(theta_nu)

    # chord lengths through each layer (zero where the layer is not crossed)
    arg1 = radii[1] ** 2 - radii[2] ** 2 * sin_t ** 2
    arg0 = radii[0] ** 2 - radii[2] ** 2 * sin_t ** 2
    d_inner = 2 * np.sqrt(np.maximum(arg0, 0.0))
    d_middle_full = 2 * np.sqrt(np.maximum(arg1, 0.0))

    only_outer = theta_nu <= np.pi - np.arcsin(radii[1] / radii[2])
    reaches_core = theta_nu > np.pi - np.arcsin(radii[0] / radii[2])

    d_inner = np.where(reaches_core, d_inner, 0.0)
    d_middle = np.where(only_outer, 0.0, d_middle_full - d_inner)
    d_outer = -2 * R_EARTH * cos_t - d_middle - d_inner

    exponent = (d_outer * densities[2] + d_middle * densities[1]
                + d_inner * densities[0]) * sigma / AMU
    w = np.exp(-exponent)
    return np.where(theta_nu <= 0.5 * np.pi, 1.0, w)


def get_weight(theta_nu, pnu, flavors, mode="core_mantle_crust_simple",
               cross_section_type="ctw", vertex_position=None, phi_nu=None):
    """Dispatcher mirroring earth_attenuation.get_weight (:12-59)."""
    if mode == "simple":
        return get_simple_weight(theta_nu, pnu, cross_section_type)
    if mode == "core_mantle_crust_simple":
        return get_core_mantle_crust_simple_weight(theta_nu, pnu, flavors,
                                                   cross_section_type)
    if mode in ("None", None):
        return np.ones_like(np.asarray(theta_nu, dtype=float))
    raise NotImplementedError(f"weight mode {mode} not implemented")
