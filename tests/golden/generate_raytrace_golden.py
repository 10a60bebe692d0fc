"""Generate golden ray-tracing conformance data by RUNNING the reference
implementation (read-only mount at /root/reference, stubs for its optional
deps in /tmp/refstubs). Mirrors the geometry distribution of the reference
regression test NuRadioMC/test/SignalProp/T05unit_test_C0_SP.py:13-28.

Run manually:
    PYTHONPATH=/tmp/refstubs:/root/reference python tests/golden/generate_raytrace_golden.py

The committed .npz is the conformance target for tests/test_raytrace.py.
"""
import numpy as np

from NuRadioMC.SignalProp import analyticraytracing as ray
from NuRadioMC.utilities import medium
from NuRadioReco.utilities import units

ice = medium.southpole_simple()

np.random.seed(10)
n_events = 400  # enough for conformance; keeps the runtime/file small
rr = np.random.triangular(50.0, 3000.0, 3000.0, n_events)
phiphi = np.random.uniform(0, 2 * np.pi, n_events)
xx = rr * np.cos(phiphi)
yy = rr * np.sin(phiphi)
zz = np.random.uniform(0.0, -3000.0, n_events)
points = np.array([xx, yy, zz]).T
x_receiver = np.array([0.0, 0.0, -5.0])

n_freqs = 32
ff = np.linspace(100 * units.MHz, 500 * units.MHz, n_freqs)

C0 = np.full((n_events, 2), np.nan)
stype = np.zeros((n_events, 2), dtype=np.int32)
path_len = np.full((n_events, 2), np.nan)
ttime = np.full((n_events, 2), np.nan)
launch = np.full((n_events, 2, 3), np.nan)
receive = np.full((n_events, 2, 3), np.nan)
atten = np.full((n_events, 2, n_freqs), np.nan)

r = ray.ray_tracing(ice, attenuation_model="SP1")
for iX, x in enumerate(points):
    r.set_start_and_end_point(x, x_receiver)
    r.find_solutions()
    for iS in range(r.get_number_of_solutions()):
        C0[iX, iS] = r.get_results()[iS]["C0"]
        stype[iX, iS] = r.get_solution_type(iS)
        path_len[iX, iS] = r.get_path_length(iS)
        ttime[iX, iS] = r.get_travel_time(iS)
        launch[iX, iS] = r.get_launch_vector(iS)
        receive[iX, iS] = r.get_receive_vector(iS)
        atten[iX, iS] = r.get_attenuation(iS, ff)

np.savez_compressed(
    "tests/golden/raytrace_sp.npz",
    points=points, receiver=x_receiver, freqs=ff,
    C0=C0, sol_type=stype, path_length=path_len, travel_time=ttime,
    launch=launch, receive=receive, attenuation=atten,
)
print("wrote tests/golden/raytrace_sp.npz,",
      np.sum(~np.isnan(C0[:, 0])), "geometries with solutions")
