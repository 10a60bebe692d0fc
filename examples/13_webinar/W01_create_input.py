"""Webinar part 1: creating NuRadioMC input event lists
(counterpart of NuRadioMC/examples/06_webinar/W01_create_input.py and
W01_create_input_extended.py).

Every dimensional quantity is multiplied by a unit from
``nuradiomc_tpu.utils.units`` (the same unit system as the reference:
lengths in metres, times in nanoseconds, frequencies in GHz, energies in
eV internally). ``length = 5 * units.km`` stores metres; print it in any
unit with ``length / units.cm``.

Usage:  python W01_create_input.py [n_events]
"""
import os
import sys

from nuradiomc_tpu.sim import evtgen
from nuradiomc_tpu.utils import units

n_events = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1000
out_dir = "input"
os.makedirs(out_dir, exist_ok=True)

# The fiducial volume is a cylinder; events are generated uniformly in it.
# NuRadioMC will calculate an effective volume referred to this cylinder.
volume = {
    "fiducial_rmin": 0 * units.km,
    "fiducial_rmax": 2 * units.km,
    "fiducial_zmin": -3 * units.km,
    "fiducial_zmax": 0 * units.km,
}

# --- basic input: a single energy ---------------------------------------
# generate_eventlist_cylinder draws vertices, directions, flavors,
# charged/neutral current interactions and inelasticities, and writes the
# HDF5 input file the simulation consumes (seed-exact vs the reference
# generator, tests/test_evtgen.py).
evtgen.generate_eventlist_cylinder(
    os.path.join(out_dir, "input_1e18.hdf5"),
    n_events, 1e18 * units.eV, 1e18 * units.eV, volume, seed=128,
    cross_sections_model="ctw")

# --- extended input: a power-law spectrum + tau secondaries -------------
# 'log_uniform' draws energies uniformly in log10 between Emin and Emax —
# the standard choice for effective-volume sweeps. With tau (anti)neutrinos
# and charged-current interactions, secondaries='stochastic' adds the
# showers the outgoing tau produces along its track (photonuclear, pair
# production, bremsstrahlung) as extra showers in the same event group, so
# their radio emission interferes in the detector.
evtgen.generate_eventlist_cylinder(
    os.path.join(out_dir, "input_3.2e+17_1.0e+19.hdf5"),
    n_events, 3.2e17 * units.eV, 1e19 * units.eV, volume, seed=129,
    spectrum="log_uniform", flavor=(16, -16), interaction_type="cc",
    secondaries="stochastic", cross_sections_model="ctw")

print("wrote", os.path.join(out_dir, "input_1e18.hdf5"),
      "and", os.path.join(out_dir, "input_3.2e+17_1.0e+19.hdf5"))
