"""ARZ model conformance: golden traces from the reference ARZ implementation
run on a single-shower library built from the committed raw AIRES profiles
(tests/golden/generate_arz_golden.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuradiomc_tpu.ops import arz
from nuradiomc_tpu.utils import units

HERE = os.path.dirname(__file__)
GOLDEN = os.path.join(HERE, "golden", "arz.npz")
MINILIB = os.path.join(HERE, "golden", "arz_minilib.pkl")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def lib():
    return arz.load_library_pickle(MINILIB)


@pytest.mark.parametrize("version", ["ARZ2019", "ARZ2020"])
def test_traces_match_reference(golden, lib, version):
    N = int(golden["N"])
    dt = float(golden["dt"])
    R = float(golden["R"])
    n_index = float(golden["n_index"])
    E = float(golden["energy"])
    thetas = jnp.asarray(golden["thetas"])

    def one(theta, is_em):
        ce = arz.select_profile(lib, E, is_em, 0)
        return arz.get_time_trace(E, theta, N, dt, lib.depth, ce, is_em,
                                  n_index, R, version=version)

    f = jax.jit(jax.vmap(jax.vmap(one, in_axes=(0, None)), in_axes=(None, 0)))
    got = np.asarray(f(thetas, jnp.asarray([False, True])))  # [2(HAD,EM), T, 3, N]

    ref = golden[version]
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-3,
                               err_msg=version)


def test_peak_amplitudes(golden, lib):
    """The on-cone peak amplitude (the physics-critical observable) matches
    the reference to better than 1%."""
    N, dt = int(golden["N"]), float(golden["dt"])
    R, n_index, E = float(golden["R"]), float(golden["n_index"]), float(golden["energy"])
    cher = np.arccos(1 / n_index)
    ce = arz.select_profile(lib, E, False, 0)
    got = np.asarray(arz.get_time_trace(E, jnp.asarray(cher), N, dt, lib.depth,
                                        ce, False, n_index, R))
    ref = golden["ARZ2020"][0, 3]  # HAD, on-cone
    np.testing.assert_allclose(np.max(np.abs(got)), np.max(np.abs(ref)), rtol=1e-2)
