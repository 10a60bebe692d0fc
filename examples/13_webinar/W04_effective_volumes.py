"""Webinar part 4: effective volumes
(counterpart of NuRadioMC/examples/06_webinar/W04EffectiveVolumes.py).

`sim.veff.get_Veff_Aeff` scans a folder of output files (one per energy
bin / zenith band), `get_Veff_Aeff_array` packs the result into an array
indexed [energy, zenith bin, trigger, quantity], and `export` writes the
human-readable yaml/json the reference tooling exchanges.

Usage:  python W04_effective_volumes.py [results_folder]
"""
import sys

import numpy as np

from nuradiomc_tpu.sim import veff as Veff
from nuradiomc_tpu.utils import units

folder = sys.argv[1] if len(sys.argv) > 1 else "results"

data = Veff.get_Veff_Aeff(folder)
(veff_array, energies, energies_low, energies_high,
 zenith_bins, trigger_names) = Veff.get_Veff_Aeff_array(data)

for ie, energy in enumerate(energies):
    for it, name in enumerate(trigger_names):
        # quantity axis: [Veff, Veff_error, weighted_sum, ...]
        v = veff_array[ie, 0, it, 0]
        err = veff_array[ie, 0, it, 1]
        # multiply by 4pi sr to quote a water-equivalent exposure volume
        print(f"E = {energy / units.eV:.3g} eV  {name}: "
              f"Veff = {v * 4 * np.pi / units.km ** 3:.4g} "
              f"+- {err * 4 * np.pi / units.km ** 3:.2g} km^3 sr")

Veff.export("Veff_webinar.json", data, export_format="json")
print("wrote Veff_webinar.json")
