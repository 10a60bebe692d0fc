"""Flux-limit utilities and the event viewer."""
import os

import numpy as np

from nuradiomc_tpu.sim import fluxes
from nuradiomc_tpu.utils import units


def test_limit_scaling():
    E = np.array([1e17, 1e18, 1e19])
    veff_sr = np.array([0.1, 1.0, 5.0]) * units.km ** 3 * 4 * np.pi
    year = 365.25 * 24 * 3600 * units.s
    lim = fluxes.get_limit_e2_flux(E, veff_sr, livetime=year)
    assert np.all(lim > 0)
    # doubling the livetime halves the limit
    lim2 = fluxes.get_limit_e2_flux(E, veff_sr, livetime=2 * year)
    np.testing.assert_allclose(lim2, lim / 2)
    # IceCube flux positive and falling
    f = fluxes.ice_cube_nu_fit(E)
    assert np.all(np.diff(f) < 0)


def test_expected_events_linear_in_flux():
    E = np.logspace(17, 19, 5)
    veff_sr = np.full(5, units.km ** 3)
    year = 365.25 * 24 * 3600 * units.s
    n1 = fluxes.get_number_of_events_for_flux(E, fluxes.ice_cube_nu_fit(E),
                                              veff_sr, year)
    n2 = fluxes.get_number_of_events_for_flux(E, 2 * fluxes.ice_cube_nu_fit(E),
                                              veff_sr, year)
    np.testing.assert_allclose(n2, 2 * n1)


def test_event_viewer(tmp_path):
    from nuradiomc_tpu.framework.event import Channel, Event, Station, Trigger
    from nuradiomc_tpu.sim import eventbrowser, io_nur

    evt = Event(0, 5)
    st = Station(42)
    ch = Channel(0)
    ch.set_trace(np.sin(np.linspace(0, 20, 256)), 2.0)
    st.add_channel(ch)
    trig = Trigger("t", [0])
    trig.set_triggered(True)
    st.set_trigger(trig)
    evt.set_station(st)
    path = str(tmp_path / "e.nur")
    w = io_nur.EventWriter(path)
    w.run(evt)
    w.end()

    out = str(tmp_path)
    eventbrowser.main([path, "--out", out])
    assert os.path.exists(os.path.join(out, "event_5_station_42.png"))


def test_event_browser_html_export(tmp_path):
    """`--html out/` writes a self-contained browser page whose embedded
    JSON carries the four tabs' data (overview/traces/simulation/showers) —
    the Dash app's capability as a static file."""
    import json
    import re

    from nuradiomc_tpu.framework import parameters as par
    from nuradiomc_tpu.framework.event import (Channel, ElectricField, Event,
                                               Shower, SimStation, Station,
                                               Trigger)
    from nuradiomc_tpu.sim import eventbrowser, io_nur

    evt = Event(0, 7)
    st = Station(11)
    for cid in (0, 1):
        ch = Channel(cid)
        ch.set_trace(np.sin(np.linspace(0, 20 + cid, 256)), 2.0)
        st.add_channel(ch)
    trig = Trigger("hl", [0, 1], "high_low")
    trig.set_triggered(True)
    trig.set_trigger_time(17.5)
    st.set_trigger(trig)
    sim = SimStation(11)
    ef = ElectricField([0])
    ef.set_trace(np.outer([0.0, 1.0, 0.5], np.sin(np.linspace(0, 9, 128))), 2.0)
    sim.add_electric_field(ef)
    st.set_sim_station(sim)
    evt.set_station(st)
    sh = Shower(3)
    shp = par.showerParameters
    sh[shp.energy] = 2e18
    sh[shp.zenith] = 0.9
    sh[shp.azimuth] = 1.2
    sh[shp.type] = "had"
    sh[shp.vertex] = np.array([100.0, -50.0, -700.0])
    evt.add_sim_shower(sh)

    path = str(tmp_path / "e.nur")
    w = io_nur.EventWriter(path)
    w.run(evt)
    w.end()

    html_dir = str(tmp_path / "html")
    eventbrowser.main([path, "--html", html_dir])
    html = open(os.path.join(html_dir, "index.html")).read()
    for marker in ("Overview", "Traces", "Simulation", "Showers", "lineplot"):
        assert marker in html
    payload = json.loads(
        re.search(r"const EVENTS = (\[.*?\]);\nlet tab", html, re.S).group(1))
    assert len(payload) == 1
    stn = payload[0]["stations"][0]
    assert stn["triggered"] and stn["triggers"][0]["name"] == "hl"
    assert stn["triggers"][0]["time"] == 17.5
    assert len(stn["channels"]) == 2 and len(stn["channels"][0]["trace_mV"]) == 256
    assert len(stn["efields"]) == 1 and len(stn["efields"][0]["eTheta"]) == 128
    assert payload[0]["showers"][0]["energy"] == 2e18
    assert payload[0]["showers"][0]["vertex"] == [100.0, -50.0, -700.0]

def test_gzk_fluxes_vs_reference():
    """Tabulated GZK flux interpolators match the reference exactly
    (E2_fluxes3.py:573-607); sampled spectra agree within MC noise."""
    golden = np.load(os.path.join(os.path.dirname(__file__), "golden", "gzk.npz"))
    E = golden["E"]
    np.testing.assert_allclose(fluxes.get_proton_10(E), golden["proton10"], rtol=1e-12)
    np.testing.assert_allclose(fluxes.get_TAGZK_flux(E), golden["ta_m3"], rtol=1e-12)
    np.testing.assert_allclose(fluxes.get_TAGZK_flux_ICRC2021(E),
                               golden["ta_icrc2021"], rtol=1e-12)

    from nuradiomc_tpu.sim.evtgen import get_energies
    q = golden["q"]
    e1 = get_energies(200000, 1e17, 1e19, "GZK-1", np.random.default_rng(8))
    # seed-to-seed MC noise floor on these quantiles is ~3%
    assert np.max(np.abs(np.quantile(e1, q) - golden["q_gzk1"])
                  / golden["q_gzk1"]) < 0.06
    e2 = get_energies(200000, 1e17, 1e19, "GZK-1+IceCube-nu-2022",
                      np.random.default_rng(9))
    assert np.max(np.abs(np.quantile(e2, q) - golden["q_combo"])
                  / golden["q_combo"]) < 0.06
    # GZK-2 spectrum samples without error and stays in range
    e3 = get_energies(5000, 1e17, 1e19, "GZK-2+IceCube-nu-2022",
                      np.random.default_rng(10))
    assert e3.min() >= 1e17 and e3.max() <= 1e19


def test_muon_flux_api(tmp_path):
    """MuonFlux (utilities/muon_flux.py API) on the Gaisser backend: known
    magnitude at 1 TeV vertical, sec(theta) enhancement at high energy,
    band integration and buffering."""
    from nuradiomc_tpu.sim.muon_flux import MuonFlux, gaisser_flux
    from nuradiomc_tpu.utils import units

    # textbook check: E^3 dN/dE at 1 TeV vertical is ~0.1-0.2 GeV^2/(cm2 s sr)
    e = 1e12  # 1 TeV
    f = gaisser_flux(e, 0.0) * units.GeV * units.cm ** 2 * units.s
    val = (e / units.GeV) ** 3 * f
    assert 0.05 < val < 0.5, val

    # sec(theta) enhancement: at 10 TeV the 60-deg flux exceeds vertical
    assert (gaisser_flux(1e13, np.deg2rad(60))
            > gaisser_flux(1e13, 0.0))
    # ... but the integral spectrum is steeper at low energy & large zenith
    mf = MuonFlux(buffer_file=str(tmp_path / "buf.pkl"))
    e_grid, flux = mf.get_mu_flux(45 * units.deg)
    assert np.all(np.diff(flux) < 0) and flux[0] > 0

    interp = mf.get_interp_angle_mu_flux(np.deg2rad(58), np.deg2rad(62))
    v1 = float(interp(np.log10(1e15)))
    assert v1 > 0
    # buffered call agrees and writes the buffer file
    v2 = mf.get_int_angle_mu_flux_buffered(1e15, np.deg2rad(58),
                                           np.deg2rad(62))
    np.testing.assert_allclose(v1, v2, rtol=1e-9)
    assert os.path.exists(tmp_path / "buf.pkl")
    # a fresh instance reuses the pickle
    mf2 = MuonFlux(buffer_file=str(tmp_path / "buf.pkl"))
    v3 = mf2.get_int_angle_mu_flux_buffered(1e15, np.deg2rad(58),
                                            np.deg2rad(62))
    np.testing.assert_allclose(v1, v3, rtol=1e-9)
