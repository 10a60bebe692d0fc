#!/usr/bin/env python3
"""Deep 4-channel phased-array Veff with noise (mirrors the reference
test/Veff/1e18eV/D05phased_array_deep.py): cheby1 chain, trigger-ADC
digitization, 2x upsampling, 11 beams, power threshold tuned to ~100 Hz."""
import sys

import jax.numpy as jnp

from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
from nuradiomc_tpu.utils import units

inputfile = sys.argv[1] if len(sys.argv) > 1 else "1e18_full.hdf5"

detector = {
    "channels": {str(i + 1): {
        "adc_n_samples": 256, "adc_sampling_frequency": 0.5, "adc_nbits": 8,
        "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
        "ant_position_x": 0.0, "ant_position_y": 0.0,
        "ant_position_z": -197.0 - i,
        "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
        "ant_type": "analytic_VPol", "amp_type": "", "cab_time_delay": 1051.0,
        "channel_id": i, "station_id": 1,
    } for i in range(4)},
    "stations": {"1": {"station_id": 1, "pos_altitude": 0,
                       "pos_easting": 0, "pos_northing": 0}},
}

sim = Simulation(
    inputfile, detector,
    config={"sampling_rate": 2.0, "noise": True,
            "propagation": {"ice_model": "southpole_2015", "focusing": True},
            "signal": {"model": "Alvarez2009"},
            "weights": {"weight_mode": "core_mantle_crust_simple",
                        "cross_section_type": "ctw"}},
    filter_chain=[
        FilterStage((96 * units.MHz, 100 * units.GHz), "cheby1",
                    {"order": 4, "rp": 0.1}),
        FilterStage((0, 220 * units.MHz), "cheby1", {"order": 7, "rp": 0.1}),
    ],
    trigger=TriggerSpec(trigger_type="phased_array",
                        pa_threshold_factor=30.85),  # ~100 Hz working point
    outputfilename="output_pa.hdf5",
    dtype=jnp.float32, chunk_size=512,
)
results = sim.run()
print(f"n_triggered = {results['n_triggered']}, "
      f"Veff*4pi = {results['veff'] / units.km ** 3 * 4 * 3.14159265:.3f} km^3 sr")
