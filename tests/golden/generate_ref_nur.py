"""Generate a REFERENCE-written .nur fixture (tests/golden/reference_events.nur)
by running the reference's own eventWriter (modules/io/eventWriter.py) on a
small deterministic set of events. The committed file is the conformance
target for our reference-.nur reader (sim/io_nur_reference.py).

Run:
    python tests/golden/make_refstubs.py
    PYTHONPATH=/tmp/refstubs:/root/reference python tests/golden/generate_ref_nur.py
"""
import numpy as np

import NuRadioReco.framework.event
import NuRadioReco.framework.station
import NuRadioReco.framework.sim_station
import NuRadioReco.framework.channel
import NuRadioReco.framework.sim_channel
import NuRadioReco.framework.electric_field
import NuRadioReco.framework.radio_shower
import NuRadioReco.framework.particle
import NuRadioReco.framework.trigger
import NuRadioReco.modules.io.eventWriter
from NuRadioReco.framework.parameters import (channelParameters as chp,
                                              electricFieldParameters as efp,
                                              particleParameters as pap,
                                              showerParameters as shp,
                                              stationParameters as stnp)
from NuRadioReco.utilities import units

rng = np.random.default_rng(42)
fs = 2.0 * units.GHz
N = 256

writer = NuRadioReco.modules.io.eventWriter.eventWriter()
writer.begin("tests/golden/reference_events.nur")

for run in range(3):
    evt = NuRadioReco.framework.event.Event(run, 100 + run)
    station = NuRadioReco.framework.station.Station(42)
    station[stnp.zenith] = 0.7 + 0.01 * run
    station[stnp.azimuth] = 1.3
    station.set_station_time(None)

    for cid in range(2):
        ch = NuRadioReco.framework.channel.Channel(cid)
        tr = rng.normal(0, 1e-3, N)
        ch.set_trace(tr, fs)
        ch.set_trace_start_time(10.0 * run + cid)
        ch[chp.maximum_amplitude] = float(np.max(np.abs(tr)))
        station.add_channel(ch)

    trig = NuRadioReco.framework.trigger.SimpleThresholdTrigger(
        "default_simple_threshold", threshold=3e-3, channels=[0, 1])
    trig.set_triggered(run % 2 == 0)
    trig.set_trigger_time(123.0 + run)
    station.set_trigger(trig)

    sim = NuRadioReco.framework.sim_station.SimStation(42)
    sim[stnp.zenith] = 0.7 + 0.01 * run
    sim[stnp.azimuth] = 1.3
    ef = NuRadioReco.framework.electric_field.ElectricField(
        [0], position=[0.0, 0.0, -100.0], shower_id=run, ray_tracing_id=0)
    spec_tr = np.zeros((3, N))
    spec_tr[1] = rng.normal(0, 1e-4, N)
    spec_tr[2] = rng.normal(0, 5e-5, N)
    ef.set_trace(spec_tr, fs)
    ef.set_trace_start_time(5.0)
    ef[efp.zenith] = 1.1
    ef[efp.azimuth] = 0.4
    ef[efp.ray_path_type] = "direct"
    sim.add_electric_field(ef)
    simch = NuRadioReco.framework.sim_channel.SimChannel(
        0, shower_id=run, ray_tracing_id=0)
    simch.set_trace(rng.normal(0, 2e-4, N), fs)
    simch.set_trace_start_time(6.0)
    sim.add_channel(simch)
    station.set_sim_station(sim)
    evt.set_station(station)

    shower = NuRadioReco.framework.radio_shower.RadioShower(run)
    shower[shp.energy] = 10 ** (17 + run) * units.eV
    shower[shp.zenith] = 0.7 + 0.01 * run
    shower[shp.azimuth] = 1.3
    shower[shp.type] = "had"
    evt.add_sim_shower(shower)

    particle = NuRadioReco.framework.particle.Particle(0)
    particle[pap.flavor] = 12
    particle[pap.energy] = 1e18 * units.eV
    evt.add_particle(particle)

    writer.run(evt, mode={"Channels": True, "ElectricFields": True,
                          "SimChannels": True, "SimElectricFields": True})

writer.end()
print("wrote tests/golden/reference_events.nur")
