"""Golden trigger data by RUNNING the reference trigger kernels
(highLowThreshold.get_high_low_triggers / get_majority_logic,
simpleThreshold.get_threshold_triggers) on random traces.

Run:  PYTHONPATH=/tmp/refstubs:/root/reference python tests/golden/generate_trigger_golden.py
"""
import numpy as np

from NuRadioReco.modules.trigger.highLowThreshold import (get_high_low_triggers,
                                                          get_majority_logic)
from NuRadioReco.modules.trigger.simpleThreshold import get_threshold_triggers

rng = np.random.default_rng(42)
n_ch, n_samp = 4, 512
dt = 0.5  # ns
traces = rng.normal(0, 1.0, size=(8, n_ch, n_samp))
# inject some pulses
for i in range(8):
    c = rng.integers(0, n_ch)
    pos = rng.integers(50, n_samp - 50)
    traces[i, c, pos:pos + 5] += np.array([4.0, -5.0, 3.0, -2.0, 1.0]) * rng.uniform(0.5, 2)

high, low = 2.5, -2.5
hl_bins = np.zeros((8, n_ch, n_samp), dtype=bool)
thr_bins = np.zeros((8, n_ch, n_samp), dtype=bool)
maj_trig = np.zeros(8, dtype=bool)
maj_first = np.zeros(8, dtype=int)

for i in range(8):
    tts = []
    for c in range(n_ch):
        hl = get_high_low_triggers(traces[i, c], high, low,
                                   time_coincidence=5.0, dt=dt)
        hl_bins[i, c, :len(hl)] = hl
        thr_bins[i, c] = get_threshold_triggers(traces[i, c], 2.5)
        tts.append(np.array(hl))
    trig, bins, times = get_majority_logic(tts, number_of_coincidences=2,
                                           time_coincidence=32.0, dt=dt)
    maj_trig[i] = trig
    maj_first[i] = bins[0] if len(bins) else -1

np.savez_compressed("tests/golden/triggers.npz",
                    traces=traces, high=high, low=low, dt=dt,
                    hl_bins=hl_bins, thr_bins=thr_bins,
                    maj_trig=maj_trig, maj_first=maj_first)
print("wrote tests/golden/triggers.npz; majority:", maj_trig)
