"""Measured hardware responses match the reference analog components."""
import os

import numpy as np
import pytest

from nuradiomc_tpu.detector import hardware_response as hr

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "hardware_responses.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.mark.parametrize("amp", ["100", "200", "300"])
def test_amp_response_matches(golden, amp):
    ff = golden["ff"]
    got = hr.get_amplifier_response(ff, amp)
    np.testing.assert_allclose(got, golden[f"amp_{amp}"], rtol=1e-9)


def test_cable_response_matches(golden):
    ff = golden["ff"]
    got = hr.get_cable_response_parametrized(ff, "LMR_400", 50.0)
    np.testing.assert_allclose(got, golden["cable_lmr400_50m"], rtol=1e-9)


def test_response_chaining_and_delay():
    ff = np.linspace(0.05, 1.0, 500)
    delay = 7.5
    r1 = hr.Response(ff, np.exp(-2j * np.pi * ff * delay), name="cable")
    r2 = hr.Response(ff, 2.0 * np.ones_like(ff), name="amp")
    chain = r1 * r2
    np.testing.assert_allclose(np.abs(chain(ff[10:-10])), 2.0, rtol=1e-6)
    np.testing.assert_allclose(chain.calculate_time_delay((0.1, 0.5)), delay,
                               rtol=1e-3)
    assert chain.get_names() == ["cable", "amp"]


def test_ara_system_response_loads():
    resp = hr.get_ara_system_response()
    ff = np.linspace(0.15, 0.6, 50)
    vals = resp(ff)
    assert np.all(np.isfinite(vals))
    assert np.max(np.abs(vals)) > 1  # in-band gain present
