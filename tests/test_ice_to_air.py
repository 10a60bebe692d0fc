"""Ice-to-air ray tracing validated against an independent numeric ray ODE.

The reference's Python ice-air path is non-functional in the studied snapshot
(its objective cannot change sign for in-air receivers, so find_solutions
always returns []); conformance is therefore established against a direct
numerical integration of the ray equations (scipy, float64):
launch at the solved angle, integrate dy/dz = 1/sqrt(C0^2 n(z)^2 - 1) through
the ice, refract at the surface with Snell's law, and verify the straight air
leg passes through the receiver. Travel time checked the same way.
"""
import numpy as np
import pytest
from scipy import integrate

from nuradiomc_tpu.models import ice as ice_models
from nuradiomc_tpu.ops import raytrace
from nuradiomc_tpu.utils.constants import speed_of_light

ICE = ice_models.southpole_2015


def _n(z):
    return ICE.n_ice - ICE.delta_n * np.exp(z / ICE.z_0)


@pytest.mark.parametrize("x1,x2", [
    ((0.0, -20.0), (300.0, 500.0)),
    ((0.0, -100.0), (100.0, 200.0)),
    ((0.0, -300.0), (50.0, 100.0)),
    ((0.0, -50.0), (1000.0, 2000.0)),
])
def test_solution_hits_receiver(x1, x2):
    sols = raytrace.find_solution_ice_to_air(x1[0], x1[1], x2[0], x2[1], ICE)
    assert bool(sols.mask[0]), "no ice-air solution found"
    c0 = float(sols.c0[0])

    # numeric integration of the in-ice path
    def dy_dz(z, y):
        return 1.0 / np.sqrt(c0 ** 2 * _n(z) ** 2 - 1.0)

    sol = integrate.solve_ivp(dy_dz, (x1[1], 0.0), [x1[0]], rtol=1e-10, atol=1e-12)
    y_exit = sol.y[0][-1]

    n_surf = _n(0.0)
    sin_ice = 1.0 / (c0 * n_surf)
    sin_air = n_surf * sin_ice
    assert sin_air < 1.0
    y_receiver = y_exit + x2[1] * sin_air / np.sqrt(1 - sin_air ** 2)
    np.testing.assert_allclose(y_receiver, x2[0], atol=1e-3)

    # travel time: numeric integral of n(z) ds / c + air leg
    def dt_dz(z, t):
        dy = dy_dz(z, None)
        return np.sqrt(1 + dy ** 2) * _n(z) / speed_of_light

    tsol = integrate.solve_ivp(dt_dz, (x1[1], 0.0), [0.0], rtol=1e-10, atol=1e-12)
    t_ice = tsol.y[0][-1]
    d_air = np.hypot(x2[0] - y_exit, x2[1])
    np.testing.assert_allclose(float(sols.travel_time[0]),
                               t_ice + d_air / speed_of_light, rtol=1e-6)

    # launch angle consistent with C0
    la = float(sols.launch_angle[0])
    np.testing.assert_allclose(np.sin(la), 1.0 / (c0 * _n(x1[1])), rtol=1e-9)


def test_unreachable_geometry_masked():
    # receiver requires an exit angle beyond the critical angle
    sols = raytrace.find_solution_ice_to_air(0.0, -1000.0, 5000.0, 10.0, ICE)
    # either found (physical) or cleanly masked — never NaN
    assert np.isfinite(float(sols.c0[0]))
