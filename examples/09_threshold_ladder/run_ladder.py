#!/usr/bin/env python3
"""Threshold-ladder Veff study in ONE simulation.

The reference's standard multi-trigger workflow registers a ladder of named
triggers per station (T02RunPhasedRNO.py:76-109 registers eight) and
post-processes per trigger name from the `multiple_triggers` matrix. Here
the ladder is declared as `triggers=[TriggerSpec, ...]` and every rung is
evaluated on the SAME assembled traces in the fused pass — the propagation
chain (ray tracing, Askaryan, attenuation, antenna, placement) runs once,
so N thresholds cost one simulation instead of N.

Run: python run_ladder.py [input.hdf5]
     (generate an input with examples/01_Veff_simulation/T01_generate_event_list.py)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax.numpy as jnp

from nuradiomc_tpu.sim import veff as veff_util
from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
from nuradiomc_tpu.utils import units

inputfile = sys.argv[1] if len(sys.argv) > 1 else "1e18_full.hdf5"

detector = {
    "channels": {"1": {
        "adc_n_samples": 256, "adc_sampling_frequency": 1.0,
        "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
        "ant_position_x": 0.0, "ant_position_y": 0.0, "ant_position_z": -100.0,
        "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
        "ant_type": "analytic_VPol", "amp_type": "", "cab_time_delay": 19.8,
        "adc_nbits": None, "channel_id": 0, "station_id": 101,
    }},
    "stations": {"1": {"station_id": 101, "pos_altitude": 0,
                       "pos_easting": 0, "pos_northing": 0}},
}

SIGMAS = (1.5, 2.0, 2.5, 3.0, 4.0)

sim = Simulation(
    inputfile, detector,
    config={"sampling_rate": 2.0,
            "propagation": {"ice_model": "southpole_2015"},
            "signal": {"model": "Alvarez2000"},
            "weights": {"weight_mode": "core_mantle_crust_simple",
                        "cross_section_type": "ctw"}},
    filter_chain=[
        FilterStage((80 * units.MHz, 1000 * units.GHz), "butter", {"order": 2}),
        FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
    ],
    triggers=[
        TriggerSpec(name=f"hilo_{s:g}sigma", threshold_high_sigma=s,
                    threshold_low_sigma=-s)
        for s in SIGMAS
    ],
    outputfilename="ladder_output.hdf5",
    dtype=jnp.float32,
    chunk_size=1024,
)
results = sim.run()

print(f"{'trigger':>14} {'n_trig':>7} {'Veff [km^3]':>12}")
for iT, name in enumerate(results["trigger_names"]):
    n = int(results["multiple_triggers"][:, iT].sum())
    v = results["veff_per_trigger"][name] / units.km ** 3
    print(f"{name:>14} {n:>7} {v:>12.4f}")

# the same numbers through the reference-style post-processing layer,
# plus an example trigger combination
post = veff_util.get_Veff_Aeff_single(
    "ladder_output.hdf5",
    trigger_combinations={
        "loose_not_tight": {"triggers": ["hilo_1.5sigma"],
                            "notriggers": ["hilo_4sigma"]}})
combo = post["veffs"]["loose_not_tight"]
print(f"{'loose_not_tight':>14} {combo[2]:>7.1f} {combo[0] / units.km**3:>12.4f}")
veff_util.export("ladder_veffs.yaml", [post])
print("wrote ladder_output.hdf5 + ladder_veffs.yaml")
