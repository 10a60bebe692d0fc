"""Physical constants in the internal unit system (see units.py)."""

from nuradiomc_tpu.utils import units

# CODATA speed of light, 299792458 m/s, expressed in m/ns
speed_of_light = 299792458.0 * units.m / units.s  # = 0.299792458 m/ns

# Boltzmann constant (J/K -> eV/K in the internal system)
boltzmann = 1.380649e-23 * units.joule / units.kelvin

# vacuum impedance (for fluence calculations)
Z_0 = 376.730313667 * units.ohm

# electron mass
m_e = 0.51099895e6 * units.eV

# Avogadro
N_A = 6.02214076e23 / units.mole
