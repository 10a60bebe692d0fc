"""Read a REFERENCE-written .nur file (tests/golden/reference_events.nur was
produced by running the reference's own eventWriter — see
tests/golden/generate_ref_nur.py) and verify traces and parameters."""
import os

import numpy as np

from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.sim import io_nur_reference as rio
from nuradiomc_tpu.utils import units

FIXTURE = os.path.join(os.path.dirname(__file__), "golden",
                       "reference_events.nur")

chp = par.channelParameters
efp = par.electricFieldParameters
shp = par.showerParameters
pap = par.particleParameters
stnp = par.stationParameters


def _expected_draws():
    """Replays the generator's RNG stream (generate_ref_nur.py, seed 42)."""
    rng = np.random.default_rng(42)
    out = []
    for run in range(3):
        chans = [rng.normal(0, 1e-3, 256) for _ in range(2)]
        ef = np.zeros((3, 256))
        ef[1] = rng.normal(0, 1e-4, 256)
        ef[2] = rng.normal(0, 5e-5, 256)
        simch = rng.normal(0, 2e-4, 256)
        out.append((chans, ef, simch))
    return out


def test_scan_and_event_ids():
    io = rio.NuRadioRecoio(FIXTURE)
    assert io.get_n_events() == 3
    assert io.get_event_ids() == [(0, 100), (1, 101), (2, 102)]


def test_events_traces_and_parameters():
    io = rio.NuRadioRecoio(FIXTURE)
    draws = _expected_draws()
    for run, evt in enumerate(io.get_events()):
        assert evt.get_run_number() == run
        assert evt.get_id() == 100 + run

        station = evt.get_station(42)
        assert station[stnp.zenith] == 0.7 + 0.01 * run
        assert station[stnp.azimuth] == 1.3

        chans, ef_exp, simch_exp = draws[run]
        for cid in range(2):
            ch = station.get_channel(cid)
            np.testing.assert_allclose(np.asarray(ch.get_trace()), chans[cid],
                                       atol=0)
            assert ch.get_sampling_rate() == 2.0 * units.GHz
            assert ch.get_trace_start_time() == 10.0 * run + cid
            assert ch[chp.maximum_amplitude] == float(np.max(np.abs(chans[cid])))

        trig = station.get_trigger("default_simple_threshold")
        assert trig.has_triggered() == (run % 2 == 0)
        assert trig.get_trigger_time() == 123.0 + run
        assert trig.get_type() == "simple_threshold"

        sim = station.get_sim_station()
        efields = sim.get_electric_fields()
        assert len(efields) == 1
        ef = efields[0]
        np.testing.assert_allclose(np.asarray(ef.get_trace()), ef_exp, atol=0)
        assert ef[efp.ray_path_type] == "direct"
        assert ef[efp.zenith] == 1.1
        assert ef.get_shower_id() == run

        sim_channels = list(sim.iter_channels())
        assert len(sim_channels) == 1
        np.testing.assert_allclose(np.asarray(sim_channels[0].get_trace()),
                                   simch_exp, atol=0)

        showers = list(evt.get_sim_showers())
        assert len(showers) == 1
        assert showers[0][shp.energy] == 10 ** (17 + run) * units.eV
        assert showers[0][shp.type] == "had"

        particles = list(evt.get_particles())
        assert len(particles) == 1
        assert particles[0][pap.flavor] == 12


def test_event_reader_module_api():
    reader = rio.eventReader()
    reader.begin(FIXTURE)
    events = list(reader.run())
    assert len(events) == 3
    reader.end()


def test_header_enums_remap_by_reference_value():
    """Header blocks pickle real reference enums (by VALUE, with deprecation
    gaps); they must land on our members by name through the interop table."""
    io = rio.NuRadioRecoio(FIXTURE)
    headers = io.get_header()
    assert len(headers) == 3
    st = headers[0]["stations"][42]
    assert stnp.zenith in st          # reference value 13 -> our member
    assert st[stnp.zenith] == 0.7


def test_unpickler_refuses_arbitrary_classes():
    import pickle

    import pytest

    class Weird:
        pass

    payload = pickle.dumps(os.system)   # stand-in for a gadget
    with pytest.raises(pickle.UnpicklingError):
        rio._loads(payload)


def test_event_reader_autodetects_reference_format():
    from nuradiomc_tpu.sim import io_nur

    reader = io_nur.EventReader(FIXTURE)
    events = list(reader.run())
    assert len(events) == 3
    assert events[2].get_id() == 102
    reader.end()
