"""Webinar part 5: electric fields and voltage traces from .nur files
(counterpart of NuRadioMC/examples/06_webinar/W05ElectricFields.py).

``.nur`` event files store the complete simulated detector response:
SimStation electric fields per (channel, shower, ray solution) and the
voltage traces after the full signal chain. They are heavy — write them
for reconstruction studies, not for million-event productions.

Usage:  python W05_electric_fields.py [results/NuMC_output.nur]
"""
import sys

import numpy as np

from nuradiomc_tpu.sim.io_nur import EventReader

fname = sys.argv[1] if len(sys.argv) > 1 else "results/NuMC_output.nur"

reader = EventReader(fname)
n_shown = 0
for event in reader.get_events():
    for station in event.get_stations():
        sim_station = station.get_sim_station() \
            if station.has_sim_station() else None
        if sim_station is None:
            continue
        for efield in sim_station.get_electric_fields():
            trace = np.asarray(efield.get_trace())     # (3, N): eR/eTheta/ePhi
            tt = efield.get_times()
            fluence = np.trapezoid(np.sum(trace ** 2, axis=0), tt)
            print(f"event {event.get_id()} station {station.get_id()} "
                  f"channels {efield.get_channel_ids()} "
                  f"ray {efield.get_ray_tracing_solution_id()}: "
                  f"|eTheta|max = {np.abs(trace[1]).max():.3g} V/m, "
                  f"energy fluence ~ {fluence:.3g}")
            n_shown += 1
        for channel in station.iter_channels():
            v = np.asarray(channel.get_trace())
            print(f"  channel {channel.get_id()}: Vpp = "
                  f"{v.max() - v.min():.3g} V")
    if n_shown >= 8:          # a few events are enough for the tutorial
        break
reader.end()
print("done;", n_shown, "electric fields inspected")
