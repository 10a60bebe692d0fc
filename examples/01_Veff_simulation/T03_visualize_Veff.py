#!/usr/bin/env python3
"""Step 3: effective-volume post-processing (mirrors the reference
T03visualizeVeff.py without the plotting dependency)."""
import numpy as np

from nuradiomc_tpu.sim import veff
from nuradiomc_tpu.utils import units

results = veff.get_Veff_Aeff("output.hdf5")
for r in results:
    v_sr = r["veff"] * r["solid_angle"]
    v_we = veff.get_Veff_water_equivalent(v_sr)
    print(f"E = {r['energy']:.3g} eV : "
          f"Veff = {v_sr / units.km ** 3:.4f} km^3 sr "
          f"({v_we / units.km ** 3:.4f} km^3 sr water equ.), "
          f"{r['n_triggered']} triggers, "
          f"+{(r['veff_high'] - r['veff']) / max(r['veff'], 1e-30) * 100:.0f}% "
          f"-{(r['veff'] - r['veff_low']) / max(r['veff'], 1e-30) * 100:.0f}%")
