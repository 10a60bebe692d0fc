"""Neutrino flux models and sensitivity limits.

Re-implementation of NuRadioMC/utilities/fluxes.py (limit calculations from
effective volumes, :138-260) and the flux models used by the sensitivity
examples (examples/Sensitivities/E2_fluxes3.py: IceCube astrophysical fits)
with the CTW cross sections bundled here.
"""

from __future__ import annotations

import numpy as np

from nuradiomc_tpu.sim import cross_sections
from nuradiomc_tpu.utils import units


def ice_cube_nu_fit(energy, slope=-2.19, offset=1.01):
    """IceCube astrophysical muon-sample flux fit (generator.py:227-232)."""
    return (3 * offset * (np.asarray(energy) / (100 * units.TeV)) ** slope
            * 1e-18 * (units.GeV ** -1 * units.cm ** -2 * units.second ** -1
                       * units.sr ** -1))


def ice_cube_nu_fit_2022(energy, slope=-2.37, offset=1.44):
    """9.5-year IceCube fit (generator.py:235-239)."""
    return ice_cube_nu_fit(energy, slope, offset)


def get_limit_flux(energy, veff_sr, livetime, signalEff=1.0,
                   energyBinsPerDecade=1.0, upperLimOnEvents=2.44,
                   cross_section_type="ctw", inttype="total"):
    """Differential flux upper limit from Veff (fluxes.get_limit_flux:46-136)."""
    energy = np.asarray(energy, dtype=float)
    evts = np.asarray(veff_sr) * signalEff * livetime
    evts = evts / cross_sections.get_interaction_length(
        energy, flavor=12, inttype=inttype, cross_section_type=cross_section_type)
    ul = upperLimOnEvents / evts
    ul *= energyBinsPerDecade / np.log(10)
    return ul / energy


def get_limit_e1_flux(energy, veff_sr, livetime, **kwargs):
    """E^1-weighted limit (fluxes.get_limit_e1_flux:138-185)."""
    return np.asarray(energy) * get_limit_flux(energy, veff_sr, livetime, **kwargs)


def get_limit_e2_flux(energy, veff_sr, livetime, **kwargs):
    """E^2-weighted limit (fluxes.get_limit_e2_flux:187-226)."""
    return np.asarray(energy) ** 2 * get_limit_flux(energy, veff_sr, livetime,
                                                    **kwargs)


def get_number_of_events_for_flux(energies, flux, veff_sr, livetime,
                                  cross_section_type="ctw", inttype="total"):
    """Expected event counts per (equidistant-log) energy bin for a flux
    assumption (fluxes.get_number_of_events_for_flux:229-280)."""
    energies = np.asarray(energies, dtype=float)
    veff_sr = np.asarray(veff_sr)
    logE = np.log10(energies)
    d_logE = logE[1] - logE[0] if len(logE) > 1 else 1.0
    # events = int flux(E) * Veff / L_int dE over the bin ~ flux E ln10 dlogE ...
    L_int = cross_sections.get_interaction_length(
        energies, flavor=12, inttype=inttype, cross_section_type=cross_section_type)
    return (np.asarray(flux) * energies * np.log(10) * d_logE
            * veff_sr / L_int * livetime)
