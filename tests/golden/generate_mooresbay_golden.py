"""Golden Moore's Bay ray tracing (bottom reflections) by RUNNING the
reference tracer with mooresbay_simple ice and n_reflections=1
(mirrors NuRadioMC/test/SignalProp/T06unit_test_C0_mooresbay.py geometry).

Run:  PYTHONPATH=/tmp/refstubs:/root/reference python tests/golden/generate_mooresbay_golden.py
"""
import numpy as np

from NuRadioMC.SignalProp import analyticraytracing as ray
from NuRadioMC.utilities import medium
from NuRadioReco.utilities import units

ice = medium.mooresbay_simple()

np.random.seed(30)
n_events = 200
rr = np.random.triangular(50.0, 2000.0, 2000.0, n_events)
phiphi = np.random.uniform(0, 2 * np.pi, n_events)
xx = rr * np.cos(phiphi)
yy = rr * np.sin(phiphi)
zz = np.random.uniform(-20.0, -500.0, n_events)
points = np.array([xx, yy, zz]).T
x_receiver = np.array([0.0, 0.0, -5.0])

S = 6  # 2 + 4*1
C0 = np.full((n_events, S), np.nan)
stype = np.zeros((n_events, S), dtype=np.int32)
refl = np.zeros((n_events, S), dtype=np.int32)
refl_case = np.zeros((n_events, S), dtype=np.int32)
path_len = np.full((n_events, S), np.nan)
ttime = np.full((n_events, S), np.nan)
launch = np.full((n_events, S, 3), np.nan)
receive = np.full((n_events, S, 3), np.nan)

cfg = {"propagation": {"attenuate_ice": True, "focusing": False,
                       "birefringence": False, "focusing_limit": 2,
                       "n_reflections": 1}}
r = ray.ray_tracing(ice, attenuation_model="MB1", config=cfg, n_reflections=1)
for iX, x in enumerate(points):
    r.set_start_and_end_point(x, x_receiver)
    r.find_solutions()
    for iS in range(r.get_number_of_solutions()):
        res = r.get_results()[iS]
        C0[iX, iS] = res["C0"]
        stype[iX, iS] = r.get_solution_type(iS)
        refl[iX, iS] = res["reflection"]
        refl_case[iX, iS] = res["reflection_case"]
        path_len[iX, iS] = r.get_path_length(iS)
        ttime[iX, iS] = r.get_travel_time(iS)
        launch[iX, iS] = r.get_launch_vector(iS)
        receive[iX, iS] = r.get_receive_vector(iS)

np.savez_compressed(
    "tests/golden/raytrace_mb.npz",
    points=points, receiver=x_receiver,
    C0=C0, sol_type=stype, reflection=refl, refl_case=refl_case,
    path_length=path_len, travel_time=ttime, launch=launch, receive=receive,
)
n_refl_sols = np.sum(~np.isnan(C0[:, 2:]))
print(f"wrote raytrace_mb.npz; {np.sum(~np.isnan(C0))} solutions, {n_refl_sols} with bottom reflection")
