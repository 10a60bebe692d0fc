"""Neutrino-nucleon cross sections (host-side numpy, vectorized).

Re-implementation of NuRadioMC/utilities/cross_sections.py: the CTW
parametrization (param:64-122, Connolly/Thorne/Waters Phys.Rev.D 83, 113009)
and the Ghandi et al. power law (get_nu_cross_section:273-274). Table-driven
models (CSMS, BGR18) require data files shipped with the reference and are
added when those tables are available.
"""

from __future__ import annotations

import numpy as np

from nuradiomc_tpu.utils import units

_CTW = {
    "cc": (-1.826, -17.31, -6.406, 1.431, -17.91),
    "nc": (-1.826, -17.31, -6.448, 1.431, -18.61),
    "cc_bar": (-1.033, -15.95, -7.247, 1.569, -17.72),
    "nc_bar": (-1.033, -15.95, -7.296, 1.569, -18.30),
}


def ctw(energy, inttype: str) -> np.ndarray:
    """CTW cross section (m^2). Valid above 1e4 GeV (param:64-122)."""
    c = _CTW[inttype]
    epsilon = np.log10(np.asarray(energy, dtype=float) / units.GeV)
    l_eps = np.log(epsilon - c[0])
    crscn = c[1] + c[2] * l_eps + c[3] * l_eps ** 2 + c[4] / l_eps
    return np.power(10.0, crscn) * units.cm ** 2


def get_nu_cross_section(energy, flavors, inttype="total",
                         cross_section_type="ctw") -> np.ndarray:
    """Total / cc / nc cross section per event (get_nu_cross_section:232-390).

    flavors: PDG codes (sign encodes particle/antiparticle).
    """
    energy = np.asarray(energy, dtype=float)
    flavors = np.asarray(flavors)

    if cross_section_type == "ghandi":
        return 7.84e-36 * units.cm ** 2 * np.power(energy / units.GeV, 0.363)

    if cross_section_type != "ctw":
        raise NotImplementedError(
            f"cross section type {cross_section_type} requires external tables")

    anti = flavors < 0
    if isinstance(inttype, str) and inttype == "total":
        crscn = np.where(anti,
                         ctw(energy, "nc_bar") + ctw(energy, "cc_bar"),
                         ctw(energy, "nc") + ctw(energy, "cc"))
    else:
        inttype_arr = np.broadcast_to(np.asarray(inttype), energy.shape)
        is_cc = np.char.lower(inttype_arr.astype(str)) == "cc"
        crscn = np.where(anti,
                         np.where(is_cc, ctw(energy, "cc_bar"), ctw(energy, "nc_bar")),
                         np.where(is_cc, ctw(energy, "cc"), ctw(energy, "nc")))
    return crscn


def get_interaction_length(Enu, density=0.917 * units.g / units.cm ** 3,
                           flavor=12, inttype="total", cross_section_type="ctw"):
    """Interaction length L = m_n / (rho sigma) (cross_sections.py:393-430)."""
    AMU = 1.66e-27 * units.kg
    sigma = get_nu_cross_section(Enu, flavor, inttype, cross_section_type)
    return AMU / density / sigma
