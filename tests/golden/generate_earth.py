"""Golden slant depths + PREM/core_mantle_crust weights from the reference.

Run: PYTHONPATH=/tmp/refstubs:/root/reference python tests/golden/generate_earth.py
(see CLAUDE.md for the /tmp/refstubs recipe)
"""
import os

import numpy as np
import radiotools.helper as hp
from NuRadioMC.utilities import earth_attenuation as ref

rng = np.random.default_rng(1)
N = 40
theta = rng.uniform(np.pi / 2 + 0.01, np.pi, N)
phi = rng.uniform(0, 2 * np.pi, N)
r = rng.uniform(0, 4000, N)
a = rng.uniform(0, 2 * np.pi, N)
z = rng.uniform(-2700, -100, N)
verts = np.c_[r * np.cos(a), r * np.sin(a), z]
pnu = 10 ** rng.uniform(17, 20, N)
flav = rng.choice([12, -12, 14, -14, 16, -16], N)

prem = ref.PREM()
cmc = ref.CoreMantleCrustModel()
sd_prem = np.array([prem.slant_depth(verts[i].copy(),
                                     hp.spherical_to_cartesian(theta[i], phi[i]))
                    for i in range(N)])
sd_cmc = np.array([cmc.slant_depth(verts[i].copy(),
                                   hp.spherical_to_cartesian(theta[i], phi[i]))
                   for i in range(N)])
w_prem = np.array([ref.get_weight(theta[i], pnu[i], flav[i], mode='PREM',
                                  cross_section_type='ctw',
                                  vertex_position=verts[i].copy(), phi_nu=phi[i])
                   for i in range(N)])
w_cmc = np.array([ref.get_weight(theta[i], pnu[i], flav[i],
                                 mode='core_mantle_crust',
                                 cross_section_type='ctw',
                                 vertex_position=verts[i].copy(), phi_nu=phi[i])
                  for i in range(N)])

out = os.path.join(os.path.dirname(__file__), "earth.npz")
np.savez_compressed(out, theta=theta, phi=phi, verts=verts, pnu=pnu, flav=flav,
                    sd_prem=sd_prem, sd_cmc=sd_cmc, w_prem=w_prem, w_cmc=w_cmc)
print("wrote", out)
