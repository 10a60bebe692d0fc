#!/usr/bin/env python3
"""Step 1: generate a 1e18 eV forced-interaction event list (mirrors the
reference examples/01_Veff_simulation/T01generate_event_list.py)."""
from nuradiomc_tpu.sim import evtgen
from nuradiomc_tpu.utils import units

volume = {
    "fiducial_rmin": 0 * units.km,
    "fiducial_rmax": 4 * units.km,
    "fiducial_zmin": -2.7 * units.km,
    "fiducial_zmax": 0 * units.km,
}

evtgen.generate_eventlist_cylinder(
    "1e18_full.hdf5", 1e4, 1e18 * units.eV, 1e18 * units.eV, volume, seed=10)
print("wrote 1e18_full.hdf5")
