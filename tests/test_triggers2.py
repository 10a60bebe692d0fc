"""Envelope / multi-high-low / ARA tunnel-diode trigger conformance."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuradiomc_tpu.ops import triggers

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "triggers2.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def test_envelope_triggers(golden):
    got = np.asarray(jax.jit(lambda t: triggers.get_envelope_triggers(t, 2.5))(
        jnp.asarray(golden["traces"])))
    np.testing.assert_array_equal(got, golden["env"])


def test_multiple_high_low(golden):
    got = np.asarray(jax.jit(lambda t: triggers.get_multiple_high_low_triggers(
        t, 2.0, -2.0, 3, 20.0, 1.0))(jnp.asarray(golden["traces"])))
    np.testing.assert_array_equal(got, golden["mhl"])


def test_tunnel_diode(golden):
    got = np.asarray(jax.jit(lambda t: triggers.tunnel_diode(t * 1e-4, 1.0))(
        jnp.asarray(golden["traces"])))
    ref = golden["diode"]
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-9)
