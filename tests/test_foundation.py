"""Unit tests for L0: units, fft conventions, config, geometry, ice models,
attenuation (compared against reference formulas evaluated directly)."""
import jax.numpy as jnp
import numpy as np

from nuradiomc_tpu.models import ice as ice_models
from nuradiomc_tpu.ops import attenuation
from nuradiomc_tpu.utils import config, fft, geometry, units
from nuradiomc_tpu.utils.constants import speed_of_light


def test_units_basics():
    assert units.km == 1000.0
    assert units.s == 1e9
    assert units.GHz == 1.0
    assert units.MHz == 1e-3
    assert abs(units.deg - np.pi / 180) < 1e-12
    assert units.V == 1.0
    assert abs(speed_of_light - 0.299792458) < 1e-12


def test_fft_power_conservation():
    rng = np.random.default_rng(0)
    fs = 2.0  # GHz
    trace = jnp.asarray(rng.normal(size=512))
    spec = fft.time2freq(trace, fs)
    back = fft.freq2time(spec, fs)
    np.testing.assert_allclose(np.asarray(back), np.asarray(trace), atol=1e-12)
    # parseval-like identity of the normalization (approximately; DC/Nyquist
    # carry the sqrt(2) too)
    dt, df = 1 / fs, fs / 512
    e_time = np.sum(np.asarray(trace) ** 2) * dt
    e_freq = np.sum(np.abs(np.asarray(spec)) ** 2) * df
    assert abs(e_time / e_freq - 1) < 0.02


def test_config_deep_merge():
    cfg = config.get_config({"propagation": {"ice_model": "greenland_simple"}})
    assert cfg["propagation"]["ice_model"] == "greenland_simple"
    assert cfg["propagation"]["attenuation_model"] == "SP1"  # default kept
    assert cfg["sampling_rate"] == 5.0


def test_ice_model_profile():
    ice = ice_models.southpole_2015
    n0 = float(ice.index_of_refraction(jnp.asarray(0.0)))
    assert abs(n0 - (1.78 - 0.423)) < 1e-12
    assert float(ice.index_of_refraction(jnp.asarray(-10000.0))) > 1.779
    assert float(ice.index_of_refraction(jnp.asarray(5.0))) == 1.0


def test_spherical_roundtrip():
    v = jnp.asarray([0.3, -0.5, 0.8])
    zen, az = geometry.cartesian_to_spherical(v)
    v2 = geometry.spherical_to_cartesian(zen, az) * jnp.linalg.norm(v)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-12)


def test_onsky_roundtrip():
    v = jnp.asarray([0.1, 0.7, -0.2])
    zen, az = 0.7, 1.3
    o = geometry.ground_to_onsky(v, zen, az)
    back = geometry.onsky_to_ground(o, zen, az)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-12)


def test_fresnel_limits():
    # normal incidence from ice (n=1.78) to air: r_p = (n-1)/(n+1), n = n2/n1
    r_p = float(np.real(geometry.fresnel_r_p(jnp.asarray(0.0), n_2=1.0, n_1=1.78)))
    n = 1.0 / 1.78
    assert abs(r_p - (n - 1) / (n + 1)) < 1e-9
    # total internal reflection: |r| = 1
    tir = geometry.fresnel_r_s(jnp.asarray(1.2), n_2=1.0, n_1=1.78)
    assert abs(abs(complex(tir)) - 1.0) < 1e-9
    # transmission at TIR is zero
    assert float(geometry.fresnel_t_p(jnp.asarray(1.2), n_2=1.0, n_1=1.78)) == 0.0


def test_attenuation_reference_values():
    # SP1 at z=-1000 m, f=300 MHz: evaluate the reference closed form directly
    z, f = -1000.0, 300 * units.MHz
    t = 1.83415e-09 * 1000 ** 3 - 1.59061e-08 * 1000 ** 2 + 0.00267687 * 1000 - 51.0696
    w = np.log(f / units.GHz)
    w1, w2 = 0.0, np.log(3.16)
    b1 = -6.22121 - t * (0.070927 + t * 0.001773)
    b2 = -4.09468 - t * (0.002213 + t * 0.000332)
    w0 = np.log(0.0001)
    b0 = -6.74890 + t * (0.026709 - t * 0.000884)
    a = (b1 * w0 - b0 * w1) / (w0 - w1)
    bb = (b1 - b0) / (w1 - w0)
    expected = 1 / np.exp(a + bb * w)
    got = float(attenuation.get_attenuation_length(jnp.asarray(z), jnp.asarray(f), "SP1"))
    np.testing.assert_allclose(got, expected, rtol=1e-10)
    # above surface -> inf
    assert np.isinf(float(attenuation.get_attenuation_length(
        jnp.asarray(5.0), jnp.asarray(f), "SP1")))
    # all models run and produce positive lengths
    for m in attenuation.MODELS:
        val = float(attenuation.get_attenuation_length(jnp.asarray(-500.0), jnp.asarray(f), m))
        assert val > 1.0, m
