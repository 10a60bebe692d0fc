"""HCRB2017 conformance vs reference-generated golden traces."""
import os

import numpy as np
import pytest

from nuradiomc_tpu.ops import hcrb2017

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "hcrb2017.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def test_traces_match_reference(golden):
    N, dt = int(golden["N"]), float(golden["dt"])
    R, n_index, E = float(golden["R"]), float(golden["n_index"]), float(golden["energy"])
    ref = golden["traces"]
    scale = np.max(np.abs(ref))
    for iem, em in enumerate([False, True]):
        for ilpm, lpm in enumerate([False, True]):
            for it, th in enumerate(golden["thetas"]):
                got = np.asarray(hcrb2017.get_time_trace(E, th, N, dt, em,
                                                         n_index, R, LPM=lpm))
                np.testing.assert_allclose(
                    got / scale, ref[iem, ilpm, it] / scale, atol=1e-6,
                    err_msg=f"em={em} lpm={lpm} theta#{it}")
