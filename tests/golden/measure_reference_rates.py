"""Measure the reference's single-core rates backing bench.py's
``vs_baseline`` denominators.

Run:
    python tests/golden/make_refstubs.py
    PYTHONPATH=/tmp/refstubs:/root/reference python tests/golden/measure_reference_rates.py

The events/s rates in bench.py's docstring come from timing the golden e2e
generators (generate_e2e_golden.py ~2.5 min for 3000 events -> ~20 ev/s;
generate_e2e_pa_golden.py -> ~3 ev/s). This script times the analytic ray
tracer in isolation (find_solutions per geometry pair, the same seeded
distribution as T05unit_test_C0_SP.py).
"""
import time

import numpy as np

from NuRadioMC.SignalProp import analyticraytracing as ray
from NuRadioMC.utilities import medium

ice = medium.southpole_simple()
np.random.seed(10)
n = 300
rr = np.random.triangular(50.0, 3000.0, 3000.0, n)
phi = np.random.uniform(0, 2 * np.pi, n)
xx, yy = rr * np.cos(phi), rr * np.sin(phi)
zz = np.random.uniform(0.0, -3000.0, n)
points = np.array([xx, yy, zz]).T
receiver = np.array([0.0, 0.0, -5.0])

r = ray.ray_tracing(ice)
# warm up interpolation caches
r.set_start_and_end_point(points[0], receiver)
r.find_solutions()

t0 = time.perf_counter()
n_sol = 0
for x in points:
    r.set_start_and_end_point(x, receiver)
    r.find_solutions()
    n_sol += r.get_number_of_solutions()
dt = time.perf_counter() - t0
print(f"reference analytic ray tracer: {n / dt:.1f} pairs/s/core "
      f"({n} pairs, {n_sol} solutions, {dt:.2f} s)")
