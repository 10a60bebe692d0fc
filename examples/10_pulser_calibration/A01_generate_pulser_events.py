#!/usr/bin/env python3
"""Step 1: write a cal-pulser event list (simulation_mode='emitter').

Mirrors the reference examples/05_pulser_calibration_measurement/ARA/
A01generate_pulser_events.py: a square-pulse voltage emitter driving an
upright dipole antenna at (500, 0, -180) m. Angles are in internal units
(radians)."""
import sys

import h5py
import numpy as np

from nuradiomc_tpu.utils import units

n = int(sys.argv[1]) if len(sys.argv) > 1 else 24

with h5py.File("emitter_event_list.hdf5", "w") as f:
    f.attrs["simulation_mode"] = "emitter"
    f.attrs["n_events"] = n
    f.attrs["start_event_id"] = 0
    f["event_group_ids"] = np.arange(n)
    f["shower_ids"] = np.arange(n)
    f["emitter_model"] = np.array([b"square"] * n)
    f["emitter_amplitudes"] = np.geomspace(1.0, 1000.0, n)  # volts
    f["emitter_half_width"] = np.full(n, 1.0 * units.ns)
    f["emitter_frequency"] = np.full(n, 0.3 * units.GHz)
    f["emitter_antenna_type"] = np.array([b"bicone_v8_inf_n1.78"] * n)
    f["emitter_orientation_phi"] = np.zeros(n)
    f["emitter_orientation_theta"] = np.zeros(n)
    f["emitter_rotation_phi"] = np.zeros(n)
    f["emitter_rotation_theta"] = np.full(n, 90 * units.deg)
    f["xx"] = np.full(n, 500.0)
    f["yy"] = np.zeros(n)
    f["zz"] = np.full(n, -180.0)
print(f"wrote emitter_event_list.hdf5 ({n} pulser events)")
