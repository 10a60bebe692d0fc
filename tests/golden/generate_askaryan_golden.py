"""Generate golden Askaryan traces by RUNNING the reference SignalGen
(mirrors NuRadioMC/test/SignalGen/U01unit_test.py sweep).

Run:  PYTHONPATH=/tmp/refstubs:/root/reference python tests/golden/generate_askaryan_golden.py
"""
import numpy as np

from NuRadioMC.SignalGen import askaryan
from NuRadioReco.utilities import units

np.random.seed(0)

models = ["ZHS1992", "Alvarez2000", "Alvarez2009"]
energies = np.array([1e15, 1e17, 1e19]) * units.eV
shower_types = ["HAD", "EM"]
n_index = 1.78
domegas = np.linspace(-5, 5, 7) * units.deg
theta = np.arccos(1.0 / n_index) + domegas
N = 512
dt = 0.5 * units.ns
R = 1 * units.km

traces = np.zeros((len(models), len(energies), len(shower_types), len(domegas), N))
k_Ls = np.zeros((len(models), len(energies), len(shower_types)))

for im, model in enumerate(models):
    for ie, E in enumerate(energies):
        for ist, st in enumerate(shower_types):
            for it, th in enumerate(theta):
                kwargs = {}
                if model == "Alvarez2009":
                    # fix the stochastic EM parameter so the comparison is exact
                    kwargs["k_L"] = 25.0 if st == "EM" else None
                    if st == "HAD":
                        kwargs.pop("k_L")
                trace = askaryan.get_time_trace(E, th, N, dt, st, n_index, R, model,
                                                seed=1234, **kwargs)
                traces[im, ie, ist, it] = trace

np.savez_compressed(
    "tests/golden/askaryan.npz",
    traces=traces, models=models, energies=energies, shower_types=shower_types,
    thetas=theta, N=N, dt=dt, R=R, n_index=n_index, em_k_L=25.0,
)
print("wrote tests/golden/askaryan.npz")
