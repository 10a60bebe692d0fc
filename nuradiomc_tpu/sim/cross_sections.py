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


# CSMS cross sections: published tables 1+2 of A. Cooper-Sarkar, P. Mertsch,
# S. Sarkar, JHEP 08 (2011) 042 (E [GeV], sigma_CC, sigma_NC [pb]); the same
# published values back the reference's csms() (cross_sections.py:123-252)
_CSMS_E = np.array([50, 100, 200, 500, 1000, 2000, 5000, 1e4, 2e4, 5e4, 1e5,
                    2e5, 5e5, 1e6, 2e6, 5e6, 1e7, 2e7, 5e7, 1e8, 2e8, 5e8,
                    1e9, 2e9, 5e9, 1e10, 2e10, 5e10, 1e11, 2e11, 5e11])
_CSMS_NU = np.array([
    [0.32, 0.10], [0.65, 0.20], [1.3, 0.41], [3.2, 1.0], [6.2, 2.0],
    [12., 3.8], [27., 8.6], [47., 15.], [77., 26.], [140., 49.],
    [210., 75.], [310., 110.], [490., 180.], [690., 260.], [950., 360.],
    [1400., 540.], [1900., 730.], [2600., 980.], [3700., 1400.],
    [4800., 1900.], [6200., 2400.], [8700., 3400.], [11000., 4400.],
    [14000., 5600.], [19000., 7600.], [24000., 9600.], [30000., 12000.],
    [39000., 16000.], [48000., 20000.], [59000., 24000.], [75000., 31000.]])
_CSMS_NUBAR = np.array([
    [0.15, 0.05], [0.33, 0.12], [0.69, 0.24], [1.8, 0.61], [3.6, 1.20],
    [7., 2.4], [17., 5.8], [31., 11.], [55., 19.], [110., 39.],
    [180., 64.], [270., 99.], [460., 170.], [660., 240.], [920., 350.],
    [1400., 530.], [1900., 730.], [2500., 980.], [3700., 1400.],
    [4800., 1900.], [6200., 2400.], [8700., 3400.], [11000., 4400.],
    [14000., 5600.], [19000., 7600.], [24000., 9600.], [30000., 12000.],
    [39000., 16000.], [48000., 20000.], [59000., 24000.], [75000., 31000.]])


def csms(energy, inttype, flavors) -> np.ndarray:
    """CSMS DIS cross sections, linear interpolation of the published tables
    (reference cross_sections.csms:123-252; bounds are an error there too)."""
    energy = np.atleast_1d(np.asarray(energy, dtype=float))
    E_tab = _CSMS_E * units.GeV
    if np.any(energy < E_tab[0]) or np.any(energy > E_tab[-1]):
        raise ValueError("energy outside the CSMS table range (50 GeV - 5e11 GeV)")
    if isinstance(inttype, str):
        inttype = np.full(energy.shape, inttype)
    flavors = np.broadcast_to(np.asarray(flavors), energy.shape)
    is_cc = np.char.lower(np.asarray(inttype).astype(str)) == "cc"
    anti = flavors < 0
    col = np.where(is_cc, 0, 1)
    nu = np.stack([np.interp(energy, E_tab, _CSMS_NU[:, c] * units.picobarn)
                   for c in (0, 1)])
    nubar = np.stack([np.interp(energy, E_tab, _CSMS_NUBAR[:, c] * units.picobarn)
                      for c in (0, 1)])
    return np.where(anti, nubar[col, np.arange(energy.size)],
                    nu[col, np.arange(energy.size)])


def get_nu_cross_section(energy, flavors, inttype="total",
                         cross_section_type="ctw") -> np.ndarray:
    """Total / cc / nc cross section per event (get_nu_cross_section:232-390).

    flavors: PDG codes (sign encodes particle/antiparticle).
    """
    energy = np.asarray(energy, dtype=float)
    flavors = np.asarray(flavors)

    if cross_section_type == "ghandi":
        return 7.84e-36 * units.cm ** 2 * np.power(energy / units.GeV, 0.363)

    if cross_section_type == "csms":
        if isinstance(inttype, str) and inttype == "total":
            return (csms(energy, "cc", flavors)
                    + csms(energy, "nc", flavors)).reshape(energy.shape)
        return csms(energy, inttype, flavors).reshape(energy.shape)

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
