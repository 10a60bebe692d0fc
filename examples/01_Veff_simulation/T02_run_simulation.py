#!/usr/bin/env python3
"""Step 2: run the fused simulation pipeline (mirrors the reference
examples/01_Veff_simulation/T02RunSimulation.py — note the declarative filter
chain + trigger replacing the subclass hooks)."""
import sys

import jax.numpy as jnp

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
    trigger=TriggerSpec(threshold_high_sigma=2.0, threshold_low_sigma=-2.0),
    outputfilename="output.hdf5",
    dtype=jnp.float32,  # production dtype; float64 for conformance studies
    chunk_size=1024,
)
results = sim.run()
print(f"n_triggered = {results['n_triggered']}, "
      f"Veff = {results['veff'] / units.km ** 3:.4f} km^3")
