"""Run the production-scale Veff campaign (the reference CI's 5e4-event
1e18 eV dipole workflow, tests/test_veff_fullscale.py) END TO END on the
real TPU chip via the production orchestrator, and report wall-clock to
Veff. The chip path is float32 (complex128 is unsupported on TPU); the
golden equality is pinned at f64 by the test — here we report the f32
triggered-count delta alongside the timing.

    python -u tools/run_fullscale_chip.py [n_events]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _enable_compilation_cache

_enable_compilation_cache()

import jax.numpy as jnp
import numpy as np

from nuradiomc_tpu.sim import evtgen
from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
from nuradiomc_tpu.utils import units

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from test_veff_fullscale import DETECTOR

n_events = int(float(sys.argv[1])) if len(sys.argv) > 1 else 50000

tmp = tempfile.mkdtemp(prefix="fullscale_chip_")
infile = os.path.join(tmp, "1e18_full.hdf5")

t0 = time.perf_counter()
evtgen.generate_eventlist_cylinder(
    infile, n_events, 1e18 * units.eV, 1e18 * units.eV,
    {"fiducial_rmin": 0, "fiducial_rmax": 4 * units.km,
     "fiducial_zmin": -2.7 * units.km, "fiducial_zmax": 0},
    seed=10, cross_sections_model="ctw")
t_gen = time.perf_counter() - t0

t1 = time.perf_counter()
sim = Simulation(
    infile, DETECTOR,
    config={"sampling_rate": 2.0,
            "propagation": {"ice_model": "southpole_2015"},
            "signal": {"model": "Alvarez2000"},
            "weights": {"weight_mode": "core_mantle_crust_simple",
                        "cross_section_type": "ctw"}},
    filter_chain=[
        FilterStage((80 * units.MHz, 1000 * units.GHz), "butter",
                    {"order": 2}),
        FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
    ],
    trigger=TriggerSpec(threshold_high_sigma=2.0, threshold_low_sigma=-2.0),
    antenna_replacements={
        "XFDTD_Vpol_CrossFeed_150mmHole_n1.78": "analytic_VPol"},
    chunk_size=4096,
    dtype=jnp.float32,
    outputfilename=os.path.join(tmp, "out.hdf5"))
res = sim.run()
t_run = time.perf_counter() - t1
timing_cold = dict(sim.exec_timing)

# second run in the same process: the pipeline jits are warm, so this is
# the steady-state production rate (upload + dispatch + drain + HDF5)
# without the one-time XLA compile that dominates the cold run
sim.exec_timing = {"pack_dispatch_s": 0.0, "drain_fetch_s": 0.0,
                   "batch_upload_s": 0.0,
                   "dispatch_chunk_s": [], "drain_chunk_s": []}
t2 = time.perf_counter()
res = sim.run()
t_run_warm = time.perf_counter() - t2
timing_warm = dict(sim.exec_timing)

golden = np.load(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden",
    "veff_fullscale_reference.npz"))
min_w = 1e-5
sel = res["triggered"] & (res["weights"] >= min_w)
mine = set(res["group_ids"][sel])
ref = set(np.unique(golden["group_ids"][golden["triggered"]]))
veff = (float(golden["volume"]) * 4 * np.pi * res["weights"][sel].sum()
        / n_events)

import json

def _split(t):
    return {
        "pack_dispatch_s": round(t["pack_dispatch_s"], 2),
        "drain_fetch_s": round(t["drain_fetch_s"], 2),
        "batch_upload_s": round(t["batch_upload_s"], 2),
        "dispatch_chunk_s": [round(x, 3) for x in t["dispatch_chunk_s"]],
        "drain_chunk_s": [round(x, 3) for x in t["drain_chunk_s"]],
    }

print(json.dumps({
    "n_events": n_events,
    "wallclock_generate_s": round(t_gen, 2),
    "wallclock_sim_to_veff_s": round(t_run, 2),
    "events_per_sec_end_to_end": round(n_events / t_run, 1),
    # steady state: same process, warm jits — no one-time XLA compile
    "wallclock_warm_s": round(t_run_warm, 2),
    "events_per_sec_steady_state": round(n_events / t_run_warm, 1),
    # executor split: pack_dispatch = host chunk packing + async dispatch
    # (chunk 0 of the cold run carries the lazy jit compile); drain_fetch
    # = blocking device wait + readback; remainder of wall-clock is input
    # parsing, batch building, and HDF5 write
    "exec_cold": _split(timing_cold),
    "exec_warm": _split(timing_warm),
    "n_triggered": int(sel.sum()),
    "golden_n_triggered": len(ref),
    "triggered_set_delta": sorted(int(g) for g in mine ^ ref),
    "veff_km3sr": round(veff / units.km ** 3, 5),
    "golden_veff_km3sr": round(float(golden["veff"]) / units.km ** 3, 5),
    "backend": "tpu-f32",
}))
