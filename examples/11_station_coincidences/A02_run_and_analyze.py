#!/usr/bin/env python3
"""Step 2: simulate the grid and report station-coincidence fractions.

Mirrors the analysis half of the reference examples/03_station_coincidences
(A04analyze_output.py): for every triggered event group, count how many
stations fired, and report the coincidence fraction per station distance.

Usage: A02_run_and_analyze.py [n_events]   (default 400)
"""
import json
import sys

import h5py
import jax.numpy as jnp
import numpy as np

from nuradiomc_tpu.sim import evtgen
from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
from nuradiomc_tpu.utils import units

n = int(sys.argv[1]) if len(sys.argv) > 1 else 400

volume = {"fiducial_rmin": 0, "fiducial_rmax": 3 * units.km,
          "fiducial_zmin": -2.7 * units.km, "fiducial_zmax": 0}
evtgen.generate_eventlist_cylinder("coincidence_events.hdf5", n, 1e19, 1e19,
                                   volume, seed=7)

with open("coincidence_detector.json") as f:
    det = json.load(f)

sim = Simulation(
    "coincidence_events.hdf5", det,
    config={"sampling_rate": 2.0,
            "propagation": {"ice_model": "southpole_2015"},
            "signal": {"model": "Alvarez2000"},
            "weights": {"weight_mode": "core_mantle_crust_simple",
                        "cross_section_type": "ctw"}},
    filter_chain=[
        FilterStage((80 * units.MHz, 1000 * units.GHz), "butter", {"order": 2}),
        FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
    ],
    trigger=TriggerSpec(threshold_high_sigma=2.0, threshold_low_sigma=-2.0),
    chunk_size=256, dtype=jnp.float64,
    outputfilename="coincidence_output.hdf5")
res = sim.run()

station_pos = {int(s["station_id"]): (s["pos_easting"], s["pos_northing"])
               for s in det["stations"].values()}

# per-station triggered event-group sets from the station output groups
fired = {}
with h5py.File("coincidence_output.hdf5") as f:
    for key in f:
        if not key.startswith("station_"):
            continue
        sid = int(key.split("_")[1])
        grp = f[key]
        if "event_group_ids" not in grp:
            fired[sid] = set()
            continue
        egid = np.asarray(grp["event_group_ids"])
        mt = np.asarray(grp["multiple_triggers_per_event"])
        fired[sid] = set(int(g) for g in egid[np.any(mt, axis=1)])

n_trig = int(np.sum(res["triggered"]))
all_fired = sorted(set().union(*fired.values())) if fired else []
counts = {g: sum(g in s for s in fired.values()) for g in all_fired}
n_coinc = sum(1 for c in counts.values() if c >= 2)

print(f"triggered {n_trig} / {n} event groups (any station)")
for sid in sorted(fired):
    x, y = station_pos[sid]
    d = float(np.hypot(x, y))
    with_center = sum(1 for g in fired[sid] if g in fired.get(101, set()))
    print(f"station {sid} (d={d:7.1f} m): {len(fired[sid]):4d} triggers, "
          f"{with_center:4d} in coincidence with center")
print(f"coincidences (>=2 stations): {n_coinc} / {len(all_fired)} "
      f"triggered groups")
