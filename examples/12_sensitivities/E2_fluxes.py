#!/usr/bin/env python3
"""Sensitivity (flux-limit) plot from an effective-volume curve.

Mirrors the reference examples/Sensitivities/E2_fluxes3.py: turn a
Veff(E) table into a differential E^2 flux limit for a given livetime and
compare against cosmogenic (GZK) and IceCube astrophysical flux models.

Usage: E2_fluxes.py [veff_table.yaml] [livetime_years]

Without a table argument, a representative in-ice radio array Veff curve is
used so the script runs stand-alone. The yaml format is the output of
`nuradiomc_tpu.sim.veff.export_veff` (energies + veff in km^3 sr).
"""
import sys

import numpy as np

from nuradiomc_tpu.sim import fluxes
from nuradiomc_tpu.utils import units

livetime = (float(sys.argv[2]) if len(sys.argv) > 2 else 10.0) * units.year

if len(sys.argv) > 1:
    import yaml
    with open(sys.argv[1]) as f:
        tab = yaml.safe_load(f)
    energies = np.asarray(tab["energies"], dtype=float)
    veff_sr = np.asarray(tab["veff"], dtype=float)
else:
    # representative deep-dipole array Veff curve (km^3 sr)
    energies = np.logspace(16, 20, 9) * units.eV
    veff_sr = (np.array([2e-4, 3e-3, 2e-2, 1e-1, 0.35, 0.9, 1.8, 3.2, 5.0])
               * 4 * np.pi * units.km ** 3)

limit = fluxes.get_limit_e2_flux(energies, veff_sr, livetime)

unit_flux = units.GeV / units.cm ** 2 / units.second
print(f"livetime {livetime / units.year:.1f} yr")
print(f"{'E [eV]':>10} {'Veff*sr [km^3 sr]':>18} {'E^2 phi [GeV/cm^2/s/sr]':>24}")
for E, v, f2 in zip(energies, veff_sr, limit):
    print(f"{E / units.eV:10.2e} {v / (units.km ** 3):18.3e} "
          f"{f2 / unit_flux:24.3e}")

# expected GZK counts for this exposure (the flux models return the
# differential flux phi(E), like the reference's get_TAGZK_flux)
n_gzk = fluxes.get_number_of_events_for_flux(
    energies, fluxes.get_TAGZK_flux_ICRC2021(energies), veff_sr, livetime)
print(f"expected TA-GZK (ICRC2021) events: {np.sum(n_gzk):.2f}")

try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    E_GeV = energies / units.GeV
    fig, ax = plt.subplots(figsize=(7, 5))
    ax.plot(E_GeV, limit / unit_flux, "k-", lw=2,
            label=f"this array, {livetime / units.year:.0f} yr")
    E_dense = np.logspace(15, 20, 100) * units.eV
    for f, lbl in [(fluxes.get_TAGZK_flux_ICRC2021, "TA GZK ICRC2021"),
                   (fluxes.get_proton_10, "10% proton GZK")]:
        ax.plot(E_dense / units.GeV, E_dense ** 2 * f(E_dense) / unit_flux,
                "--", label=lbl)
    icfit = E_dense ** 2 * fluxes.ice_cube_nu_fit_2022(E_dense)
    ax.plot(E_dense / units.GeV, icfit / unit_flux, ":",
            label="IceCube 2022 fit")
    ax.set_xscale("log"); ax.set_yscale("log")
    ax.set_xlabel("E [GeV]")
    ax.set_ylabel(r"$E^2\Phi$ [GeV cm$^{-2}$ s$^{-1}$ sr$^{-1}$]")
    ax.set_ylim(1e-11, 1e-5); ax.legend(fontsize=8)
    fig.tight_layout(); fig.savefig("sensitivity.png", dpi=120)
    print("wrote sensitivity.png")
except Exception as exc:  # matplotlib optional
    print(f"plot skipped: {exc}")
