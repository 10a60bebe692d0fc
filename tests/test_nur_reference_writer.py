"""Reference-format .nur WRITING: files produced by ReferenceEventWriter must
be readable by our own reader AND by the reference's NuRadioRecoio (run in a
subprocess against /root/reference when available)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.event import (Channel, ElectricField, Event,
                                           Particle, Shower, SimChannel,
                                           SimStation, Station, Trigger)
from nuradiomc_tpu.sim import io_nur_reference as rio

chp = par.channelParameters
efp = par.electricFieldParameters
shp = par.showerParameters
stnp = par.stationParameters
pap = par.particleParameters

REFERENCE = "/root/reference"


def _make_event(run):
    rng = np.random.default_rng(100 + run)
    evt = Event(run, 500 + run)
    st = Station(42)
    st[stnp.zenith] = 0.7 + 0.01 * run
    st[stnp.azimuth] = 1.25
    for cid in range(2):
        ch = Channel(cid)
        ch.set_trace(rng.normal(0, 1e-3, 128), 2.0)
        ch.set_trace_start_time(5.0 + cid)
        ch[chp.maximum_amplitude] = float(np.abs(ch.get_trace()).max())
        st.add_channel(ch)
    trig = Trigger("t0", [0, 1], "simple_threshold")
    trig.set_triggered(True)
    trig.set_trigger_time(77.0 + run)
    st.set_trigger(trig)

    sim = SimStation(42)
    ef = ElectricField([0], position=[0.0, 0.0, -50.0], shower_id=run,
                       ray_tracing_id=1)
    ef.set_trace(rng.normal(0, 1e-4, (3, 128)), 2.0)
    ef.set_trace_start_time(3.0)
    ef[efp.zenith] = 1.0
    ef[efp.ray_path_type] = "refracted"
    sim.add_electric_field(ef)
    sc = SimChannel(0, shower_id=run, ray_tracing_id=1)
    sc.set_trace(rng.normal(0, 2e-4, 128), 2.0)
    sim.add_channel(sc)
    st.set_sim_station(sim)
    evt.set_station(st)

    sh = Shower(run)
    sh[shp.energy] = 1e17 * (run + 1)
    sh[shp.type] = "had"
    evt.add_sim_shower(sh)
    p = Particle(0)
    p[pap.flavor] = 14
    evt.add_particle(p)
    return evt


@pytest.fixture(scope="module")
def written(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("refnur") / "mine.nur")
    w = rio.ReferenceEventWriter(path)
    for run in range(3):
        w.run(_make_event(run))
    w.end()
    return path


def test_own_reader_roundtrip(written):
    io = rio.NuRadioRecoio(written)
    assert io.get_n_events() == 3
    assert io.get_event_ids() == [(0, 500), (1, 501), (2, 502)]
    for run, evt in enumerate(io.get_events()):
        want = _make_event(run)
        st, st_w = evt.get_station(42), want.get_station(42)
        assert st[stnp.zenith] == st_w[stnp.zenith]
        for cid in range(2):
            np.testing.assert_array_equal(
                np.asarray(st.get_channel(cid).get_trace()),
                np.asarray(st_w.get_channel(cid).get_trace()))
        trig = st.get_trigger("t0")
        assert trig.has_triggered() and trig.get_trigger_time() == 77.0 + run
        sim = st.get_sim_station()
        np.testing.assert_array_equal(
            np.asarray(sim.get_electric_fields()[0].get_trace()),
            np.asarray(st_w.get_sim_station().get_electric_fields()[0].get_trace()))
        assert list(evt.get_sim_showers())[0][shp.energy] == 1e17 * (run + 1)
        assert list(evt.get_particles())[0][pap.flavor] == 14


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not available")
def test_reference_nuradiorecoio_reads_our_file(written, tmp_path):
    """THE interop check: the reference's own NuRadioRecoio parses our file
    (block scan, header enums by value, event payload deserialize)."""
    if not os.path.isdir("/tmp/refstubs"):
        subprocess.run([sys.executable, "tests/golden/make_refstubs.py"],
                       check=True, cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    script = f"""
import numpy as np
import NuRadioReco.modules.io.NuRadioRecoio as rio
from NuRadioReco.framework.parameters import stationParameters as stnp
io = rio.NuRadioRecoio({written!r})
assert io.get_n_events() == 3, io.get_n_events()
ids = [tuple(int(v) for v in e) for e in io.get_event_ids()]
assert ids == [(0, 500), (1, 501), (2, 502)], ids
evt = io.get_event_i(1)
st = evt.get_station(42)
assert abs(st.get_parameter(stnp.zenith) - 0.71) < 1e-12
tr = np.asarray(st.get_channel(0).get_trace())
assert tr.shape == (128,) and np.abs(tr).max() > 0
trig = st.get_trigger('t0')
assert trig.has_triggered() and trig.get_trigger_time() == 78.0
sim = st.get_sim_station()
efs = sim.get_electric_fields()
assert len(efs) == 1 and np.asarray(efs[0].get_trace()).shape == (3, 128)
sh = list(evt.get_sim_showers())[0]
from NuRadioReco.framework.parameters import showerParameters as shp
assert sh.get_parameter(shp.energy) == 2e17
# header parsed with reference enum objects
hdr = io.get_header()
assert abs(hdr[42][stnp.zenith][1] - 0.71) < 1e-12
print('REFERENCE-READ-OK')
"""
    env = dict(os.environ,
               PYTHONPATH="/tmp/refstubs:" + REFERENCE)
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True)
    assert "REFERENCE-READ-OK" in r.stdout, (r.stdout[-2000:], r.stderr[-3000:])
