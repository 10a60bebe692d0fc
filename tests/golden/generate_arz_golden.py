"""Golden ARZ traces: build a single-shower library from the raw AIRES
profiles committed in the reference repo and RUN the reference ARZ model on
it (python path, interp_factor2=100).

Run:  PYTHONPATH=/tmp/refstubs:/root/reference python tests/golden/generate_arz_golden.py
"""
import os
import pickle

import numpy as np

from NuRadioReco.utilities import units

REF = "/root/reference/NuRadioMC/SignalGen/ARZ/shower_library"

# build mini library (same construction as scripts/A01preprocess_shower_library_v1.2.py)
depth_e, N_e = np.loadtxt(os.path.join(REF, "nue_1EeV_CC_1_s0001.t1005"),
                          unpack=True, usecols=(1, 2))
depth_p, N_p = np.loadtxt(os.path.join(REF, "nue_1EeV_CC_1_s0001.t1006"),
                          unpack=True, usecols=(1, 2))
depth = depth_e * units.g / units.cm ** 2 - 1000 * units.g / units.cm ** 2
ce = N_e - N_p
E = 1e18 * units.eV
lib = {"EM": {E: {"depth": depth, "charge_excess": [ce]}},
       "HAD": {E: {"depth": depth, "charge_excess": [ce]}}}
minilib_path = "tests/golden/arz_minilib.pkl"
with open(minilib_path, "wb") as f:
    pickle.dump(lib, f)

from NuRadioMC.SignalGen.ARZ import ARZ

N = 512
dt = 0.2 * units.ns
n_index = 1.78
R = 800 * units.m
cher = np.arccos(1 / n_index)
thetas = cher + np.array([-5, -2, -0.5, 0.0, 0.5, 2, 5]) * units.deg

out = {}
for version in ["ARZ2019", "ARZ2020"]:
    arz = ARZ.ARZ(seed=1234, library=minilib_path, arz_version=version, use_numba=False)
    traces = np.zeros((2, len(thetas), 3, N))
    for ist, st in enumerate(["HAD", "EM"]):
        for it, th in enumerate(thetas):
            traces[ist, it] = arz.get_time_trace(
                1.2e18 * units.eV, th, N, dt, st, n_index, R, iN=0)
    out[version] = traces

np.savez_compressed("tests/golden/arz.npz",
                    ARZ2019=out["ARZ2019"], ARZ2020=out["ARZ2020"],
                    thetas=thetas, N=N, dt=dt, R=R, n_index=n_index,
                    energy=1.2e18 * units.eV, lib_energy=E)
print("wrote tests/golden/arz.npz; max amp:",
      np.max(np.abs(out["ARZ2020"])))
