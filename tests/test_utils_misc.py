"""particle_names / framework_utilities / Templates provider
(reference NuRadioReco/utilities counterparts)."""

import pickle

import numpy as np
import pytest

from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.event import Channel, Event, Station
from nuradiomc_tpu.utils import particle_names
from nuradiomc_tpu.utils.framework_utilities import get_averaged_channel_parameter
from nuradiomc_tpu.utils.templates import Templates

chp = par.channelParameters


def test_particle_names_roundtrip():
    assert particle_names.particle_name(12) == "Electron neutrino"
    assert particle_names.particle_id("Tau (negative)") == 15
    for pid, name in particle_names.particle_names.items():
        assert particle_names.particle_id(name) == pid
    with pytest.raises(ValueError):
        particle_names.particle_name(999)
    with pytest.raises(TypeError):
        particle_names.particle_name("12")
    assert set(particle_names.em_primary_names).issubset(
        particle_names.primary_names)


def test_averaged_channel_parameter():
    station = Station(7)
    for cid, (snr, xc) in enumerate([(3.0, 0.5), (5.0, 0.7)]):
        ch = Channel(cid)
        ch.set_trace(np.zeros(16), 1.0)
        ch[chp.SNR] = snr
        ch[chp.cr_xcorrelations] = {"cr_max_xcorr": xc}
        station.add_channel(ch)
    evt = Event(0, 0)
    evt.set_station(station)

    assert get_averaged_channel_parameter(evt, chp.SNR) == pytest.approx(4.0)
    d = get_averaged_channel_parameter(station, chp.cr_xcorrelations)
    assert d["cr_max_xcorr"] == pytest.approx(0.6)
    with pytest.raises(KeyError):
        get_averaged_channel_parameter(station, chp.signal_time)


def _write_template_pickles(tmp_path, station_id=51):
    rng = np.random.default_rng(0)
    trace = lambda: rng.normal(size=32)  # noqa: E731
    zen_c, az_c = np.deg2rad([60, 50, 70]), np.deg2rad([0, 22.5, 45])
    cr = [{z: {a: {ch: trace() for ch in range(6)} for a in az_c}
           for z in zen_c} for _ in range(2)]
    zen_n, az_n = np.deg2rad([100, 120, 140]), np.deg2rad([0, 22.5, 45])
    dchs = list(np.deg2rad([0, -0.5, -1, -1.5, -2, -3, -4, -5]))
    dchs[0] = 0.0
    nu = {z: {a: {d: {ch: trace() for ch in range(6)} for d in dchs}
              for a in az_n} for z in zen_n}
    with open(tmp_path / f"templates_cr_station_{station_id}.pickle", "wb") as f:
        pickle.dump(cr, f)
    with open(tmp_path / f"templates_nu_station_{station_id}.pickle", "wb") as f:
        pickle.dump(nu, f)


def test_templates_provider(tmp_path):
    _write_template_pickles(tmp_path, station_id=51)
    prov = Templates(str(tmp_path))

    refs = prov.get_cr_ref_templates(51)
    assert set(refs) == set(range(6))
    # station 51's CR-sensitive channel is 4 (reference hardcoded table)
    np.testing.assert_array_equal(prov.get_cr_ref_template(51), refs[4])

    full = prov.get_set_of_cr_templates_full(51, n=5)
    assert len(full) == 5
    ordered = prov.get_set_of_cr_templates(51, n=4)
    assert len(ordered) == 4

    nu_refs = prov.get_nu_ref_templates(51)
    np.testing.assert_array_equal(prov.get_nu_ref_template(51), nu_refs[0])
    nu_set = prov.get_set_of_nu_templates(51, n=10)
    assert len(nu_set) == 10

    with pytest.raises(IOError):
        prov.get_cr_ref_templates(99)


def test_proposal_table_manager_cli():
    """proposal_table_manager parity (EvtGen/proposal_table_manager.py):
    table-free backend makes 'create' a no-op, 'download' demands the real
    PROPOSAL package, and the CLI parses the reference's argument shape."""
    import pytest

    from nuradiomc_tpu.sim import proposal_table_manager as ptm

    assert ptm.get_compiler() in ("gcc", "clang")
    assert ptm.produce_proposal_tables("SouthPole") is False
    assert ptm.produce_proposal_tables_tarball("SouthPole") is None
    with pytest.raises(ImportError):
        ptm.download_proposal_tables("SouthPole")
    # CLI: create over 'all' configs is a no-op without PROPOSAL installed
    ptm.main(["create", "all"])
