"""Conformance tests for the Askaryan parametrizations against golden traces
generated from the reference (tests/golden/generate_askaryan_golden.py,
mirroring NuRadioMC/test/SignalGen/U01unit_test.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuradiomc_tpu.ops import askaryan
from nuradiomc_tpu.utils import units, fft

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "askaryan.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN, allow_pickle=True)


@pytest.mark.parametrize("model", ["ZHS1992", "Alvarez2000", "Alvarez2009"])
def test_traces_match_reference(golden, model):
    models = list(golden["models"])
    im = models.index(model)
    N = int(golden["N"])
    dt = float(golden["dt"])
    R = float(golden["R"])
    n_index = float(golden["n_index"])
    energies = golden["energies"]
    thetas = golden["thetas"]
    em_k_L = float(golden["em_k_L"])

    # build the full sweep as one jitted vmapped batch
    EE, SS, TT = np.meshgrid(energies, [0, 1], thetas, indexing="ij")
    e_flat = jnp.asarray(EE.ravel())
    em_flat = jnp.asarray(SS.ravel() == 1)
    th_flat = jnp.asarray(TT.ravel())
    k_flat = jnp.where(em_flat, em_k_L,
                       jnp.asarray(askaryan.had_k_L_alvarez2009(e_flat)))

    f = jax.jit(jax.vmap(lambda e, t, em, kl: askaryan.get_time_trace(
        e, t, N, dt, em, n_index, R, model, k_L=kl)))
    got = np.asarray(f(e_flat, th_flat, em_flat, k_flat)).reshape(
        len(energies), 2, len(thetas), N)

    ref = golden["traces"][im]  # [energy, shower_type(HAD,EM), theta, N]
    scale = np.maximum(np.max(np.abs(ref), axis=-1, keepdims=True), 1e-300)
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-9, err_msg=model)


def test_spectrum_is_time2freq_of_trace(golden):
    N, dt = int(golden["N"]), float(golden["dt"])
    spec, trace = jax.jit(lambda: (
        askaryan.get_frequency_spectrum(
            1e18 * units.eV, 0.9, N, dt, False, 1.78, 1 * units.km, "Alvarez2000"),
        askaryan.get_time_trace(
            1e18 * units.eV, 0.9, N, dt, False, 1.78, 1 * units.km, "Alvarez2000")))()
    # the Nyquist bin of an rfft of a real trace is forced real, while the
    # directly-built spectrum keeps a (tiny) imaginary part there
    np.testing.assert_allclose(np.asarray(fft.time2freq(trace, 1.0 / dt)),
                               np.asarray(spec), atol=1e-9)


def test_vmapped_batch():
    N, dt = 256, 0.2
    energies = jnp.array([1e17, 1e18, 1e19])
    thetas = jnp.array([0.9, 1.0, 1.1])
    is_em = jnp.array([False, True, False])
    k_L = jnp.array([30.0, 25.0, 35.0])
    f = jax.jit(jax.vmap(
        lambda e, t, em, kl: askaryan.get_frequency_spectrum(
            e, t, N, dt, em, 1.78, 1000.0, "Alvarez2009", k_L=kl)))
    out = f(energies, thetas, is_em, k_L)
    assert out.shape == (3, N // 2 + 1)
    assert np.all(np.isfinite(np.asarray(out).view(np.float64)))
