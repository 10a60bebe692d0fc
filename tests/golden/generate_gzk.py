"""Golden GZK flux values + sampled-spectrum quantiles from the reference.

Run: PYTHONPATH=/tmp/refstubs:/root/reference python tests/golden/generate_gzk.py
"""
import os

import matplotlib
matplotlib.use("Agg")
import numpy as np

from NuRadioMC.examples.Sensitivities.E2_fluxes3 import (
    get_proton_10, get_TAGZK_flux, get_TAGZK_flux_ICRC2021)
from NuRadioMC.EvtGen.generator import get_energies

E = np.logspace(16.1, 19.9, 50)
q = np.linspace(0.01, 0.99, 21)
rnd = np.random.default_rng(7)
e_gzk1 = get_energies(200000, 1e17, 1e19, "GZK-1", rnd)
e_combo = get_energies(200000, 1e17, 1e19, "GZK-1+IceCube-nu-2022", rnd)

out = os.path.join(os.path.dirname(__file__), "gzk.npz")
np.savez_compressed(
    out, E=E, q=q,
    proton10=get_proton_10(E),
    ta_m3=get_TAGZK_flux(E),
    ta_icrc2021=get_TAGZK_flux_ICRC2021(E),
    q_gzk1=np.quantile(e_gzk1, q),
    q_combo=np.quantile(e_combo, q),
)
print("wrote", out)
