"""Measured pulser waveforms match the reference emitter output exactly."""
import os

import numpy as np
import pytest

from nuradiomc_tpu.ops import emitter

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "emitter_measured.npz")


@pytest.mark.parametrize("model", ["idl1", "hvsp1", "ARA02_calPulser",
                                   "rno_cal5C_10dB"])
def test_measured_waveforms_match(model):
    g = np.load(GOLDEN)
    got = emitter.get_measured_time_trace(model, float(g["amplitude"]),
                                          int(g["N"]), float(g["dt"]))
    np.testing.assert_allclose(got, g[model], atol=1e-12)
