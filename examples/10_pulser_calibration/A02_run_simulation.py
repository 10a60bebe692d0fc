#!/usr/bin/env python3
"""Step 2: propagate the pulser signals to a 4-dipole station and trigger.

Mirrors the reference examples/05_pulser_calibration_measurement/ARA/
runARA02.py on an analytic-antenna stand-in detector: the orchestrator
detects simulation_mode='emitter', folds the square-pulse voltage spectrum
with the emitting-antenna VEL (-i f n/c), ray-traces, and triggers."""
import sys

import jax.numpy as jnp
import numpy as np

from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
from nuradiomc_tpu.utils import units

inputfile = sys.argv[1] if len(sys.argv) > 1 else "emitter_event_list.hdf5"

detector = {
    "channels": {str(i + 1): {
        "adc_n_samples": 512, "adc_sampling_frequency": 1.0,
        "ant_orientation_phi": 0.0, "ant_orientation_theta": 0.0,
        "ant_position_x": 0.0, "ant_position_y": 0.0,
        "ant_position_z": -170.0 - 10 * i,
        "ant_rotation_phi": 90.0, "ant_rotation_theta": 90.0,
        "ant_type": "bicone_v8_inf_n1.78", "amp_type": "",
        "cab_time_delay": 0.0, "adc_nbits": None,
        "channel_id": i, "station_id": 2,
    } for i in range(4)},
    "stations": {"2": {"station_id": 2, "pos_altitude": 0,
                       "pos_easting": 0, "pos_northing": 0}},
}

sim = Simulation(
    inputfile,
    detector,
    config={"sampling_rate": 5.0, "noise": False,
            "propagation": {"ice_model": "ARAsim_southpole",
                            "focusing": True},
            "trigger": {"noise_temperature": 300}},
    filter_chain=[
        FilterStage((80 * units.MHz, 1000 * units.GHz), "butter", {"order": 2}),
        FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
    ],
    triggers=[TriggerSpec(name="dipole_2.0sigma", trigger_type="high_low",
                          threshold_high_sigma=2.0, threshold_low_sigma=-2.0,
                          number_of_coincidences=2)],
    antenna_replacements={"bicone_v8_inf_n1.78": "analytic_VPol"},
    chunk_size=32,
    dtype=jnp.float64,
    outputfilename="pulser_output.hdf5")
res = sim.run()
n_trig = int(np.sum(res["triggered"]))
print(f"triggered {n_trig} / {len(res['triggered'])} pulser events")
print("amplitude sweep:", np.asarray(res["triggered"]).astype(int).tolist())
