"""Radio-interferometric reconstruction: X_RIT depth + axis recovery on a
synthetic point source (efieldRadioInterferometricReconstruction.py:32-754)."""
import numpy as np
import pytest

from nuradiomc_tpu.models.atmosphere import Atmosphere, Refractivity
from nuradiomc_tpu.reco.rit import (
    efieldInterferometricAxisReco, efieldInterferometricDepthReco,
    fit_axis_through_points, get_signal, interfere_traces, shower_frame)
from nuradiomc_tpu.utils.constants import speed_of_light

ZEN_TRUE = np.deg2rad(32.0)
AZ_TRUE = np.deg2rad(70.0)   # direction the shower comes FROM
X_TRUE = 650.0               # slant depth of the emission maximum
B_FIELD = np.array([0.0, 18.0, -49.0])  # ~south pole-ish field, any tilt ok


def _axis_up():
    """Unit vector from the core toward the source."""
    return np.array([np.sin(ZEN_TRUE) * np.cos(AZ_TRUE),
                     np.sin(ZEN_TRUE) * np.sin(AZ_TRUE), np.cos(ZEN_TRUE)])


@pytest.fixture(scope="module")
def synthetic_event():
    """Line emitter along the axis: gaussian-in-depth emission profile
    centered at X_TRUE (a point source would bias the axis fit toward the
    source -> array-centroid line instead of the shower axis)."""
    at = Atmosphere(17)
    refr = Refractivity(at)
    src_depths = np.linspace(X_TRUE - 150, X_TRUE + 150, 7)
    amps = np.exp(-0.5 * ((src_depths - X_TRUE) / 80.0) ** 2)
    sources = [_axis_up() * at.get_distance_xmax_geometric(ZEN_TRUE, X, 0.0)
               for X in src_depths]
    rng = np.random.default_rng(0)
    n_ant, n, fs = 30, 2048, 1.0
    positions = np.c_[rng.uniform(-400, 400, n_ant),
                      rng.uniform(-400, 400, n_ant), np.zeros(n_ant)]
    # the shower front moves down the axis at c: point at distance d emits
    # at t_emit = -d/c, so all pulses arrive nearly simultaneously and only
    # the wavefront curvature distinguishes the depths (as in reality)
    dists = [np.linalg.norm(s) for s in sources]
    all_arrivals = [refr.time_delay(s, positions, speed_of_light)
                    - d / speed_of_light
                    for s, d in zip(sources, dists)]
    t0 = min(a.min() for a in all_arrivals) - 300.0
    t = np.arange(n) / fs
    times = np.tile(t, (n_ant, 1)) + t0
    traces = np.zeros((n_ant, n))
    for amp, arr in zip(amps, all_arrivals):
        traces += amp * np.exp(-0.5 * ((t[None, :] + t0 - arr[:, None])
                                       / 5.0) ** 2) \
            * np.cos(0.3 * (t[None, :] + t0 - arr[:, None]))
    dist = at.get_distance_xmax_geometric(ZEN_TRUE, X_TRUE, 0.0)
    return positions, traces, times, _axis_up() * dist, dist


def test_interference_peaks_at_source(synthetic_event):
    positions, traces, times, source, _ = synthetic_event
    at = Atmosphere(17)
    refr = Refractivity(at)
    on, tstep = interfere_traces(source, positions, traces, times, refr)
    off, _ = interfere_traces(source + np.array([500.0, 0, 0]),
                              positions, traces, times, refr)
    assert get_signal(on, tstep) > 5 * get_signal(off, tstep)


def test_depth_reconstruction(synthetic_event):
    positions, traces, times, _, _ = synthetic_event
    reco = efieldInterferometricDepthReco()
    reco.begin()
    popt = reco.reconstruct_interferometric_depth(
        traces, times, positions, _axis_up(), np.zeros(3))
    assert abs(popt[1] - X_TRUE) < 30.0   # g/cm^2


def test_axis_reconstruction(synthetic_event):
    positions, traces, times, _, _ = synthetic_event
    reco = efieldInterferometricAxisReco()
    reco.begin()
    # slightly wrong initial axis (0.5 deg off) and core (60 m off)
    zen_g = ZEN_TRUE + np.deg2rad(0.5)
    axis_guess = np.array([np.sin(zen_g) * np.cos(AZ_TRUE),
                           np.sin(zen_g) * np.sin(AZ_TRUE), np.cos(zen_g)])
    zen, az, core = reco.reconstruct_shower_axis(
        traces, times, positions, axis_guess, np.array([60.0, 0.0, 0.0]),
        B_FIELD, depths=(450.0, 550.0, 650.0, 750.0, 850.0), grid_size=250.0)
    # space-angle error is the meaningful metric (azimuth degenerates with
    # 1/sin(zenith)); the lateral focus resolution of a 800 m array at
    # ~5-10 km distance with a 5 ns pulse is ~10 m -> ~0.3 deg
    rec = np.array([np.sin(zen) * np.cos(az), np.sin(zen) * np.sin(az),
                    np.cos(zen)])
    space_angle = np.arccos(np.clip(np.dot(rec, _axis_up()), -1, 1))
    assert space_angle < np.deg2rad(0.45)
    assert np.linalg.norm(core[:2]) < 60.0   # true core at the origin


def test_fit_axis_exact():
    axis = _axis_up()
    pts = [axis * d + np.array([5.0, -3.0, 0.0]) for d in (2e3, 5e3, 9e3)]
    zen, az, core = fit_axis_through_points(pts)
    assert abs(zen - ZEN_TRUE) < 1e-9
    assert abs(az - AZ_TRUE) < 1e-9
    np.testing.assert_allclose(core, [5.0, -3.0, 0.0], atol=1e-6)
