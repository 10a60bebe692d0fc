"""Neutrino direction + energy forward-folding fit
(neutrinoDirectionReconstructor/voltageToEfieldAnalyticConverterForNeutrinos.py)."""
import numpy as np

from nuradiomc_tpu.framework import parameters as par
from nuradiomc_tpu.framework.event import Channel, Event, Station
from nuradiomc_tpu.models import ice as ice_models
from nuradiomc_tpu.reco.nu_direction import neutrinoDirectionReconstructor
from nuradiomc_tpu.utils import units

from test_vertex import _det_string, DEPTHS

stnp = par.stationParameters
ICE = ice_models.get_ice_model("greenland_simple")


def test_recovers_direction_and_energy():
    det = _det_string()
    vertex = np.array([420.0, 0.0, -520.0])
    zen_true, az_true = np.deg2rad(115.0), np.deg2rad(20.0)
    logE_true = 17.3
    fs, n = 2.0, 1024

    reco = neutrinoDirectionReconstructor()
    reco.begin(ICE, attenuation_model="GL1")

    # build the event with the module's own forward model at the true
    # parameters (the physics inside — Askaryan, attenuation, antennas — is
    # golden-validated elsewhere; this validates the vectorized fit)
    st = Station(21)
    for cid in range(4):
        ch = Channel(cid)
        ch.set_trace(np.zeros(n), fs)
        st.add_channel(ch)
    evt = Event(0, 0)
    evt.set_station(st)

    # dry call to build `forward` with the right geometry; chi2 of truth
    reco.run(evt, st, det, vertex=vertex, use_channels=[0, 1, 2, 3],
             zenith_range=(zen_true - 0.01, zen_true + 0.01),
             azimuth_range=(az_true - 0.01, az_true + 0.01),
             energy_range=(logE_true - 0.01, logE_true + 0.01),
             coarse_steps=(2, 2, 2), n_zoom=0)
    truth_traces = np.asarray(reco.forward(zen_true, az_true, logE_true))
    assert np.max(np.abs(truth_traces)) > 0

    rng = np.random.default_rng(0)
    noise = 0.02 * np.max(np.abs(truth_traces))
    for cid in range(4):
        st.get_channel(cid).set_trace(
            truth_traces[cid] + rng.normal(0, noise, n), fs)

    # fit in a +-10 deg, +-1 dex window (the reference's use_MC mode)
    zen, az, logE = reco.run(
        evt, st, det, vertex=vertex, use_channels=[0, 1, 2, 3],
        noise_RMS=noise,
        zenith_range=(zen_true - np.deg2rad(10), zen_true + np.deg2rad(10)),
        azimuth_range=(az_true - np.deg2rad(10), az_true + np.deg2rad(10)),
        energy_range=(logE_true - 1.0, logE_true + 1.0),
        coarse_steps=(11, 11, 11), n_zoom=2)

    assert abs(zen - zen_true) < np.deg2rad(1.0)
    assert abs(np.mod(az - az_true + np.pi, 2 * np.pi) - np.pi) < np.deg2rad(1.5)
    assert abs(logE - logE_true) < 0.15
    assert st.has_parameter(stnp.nu_zenith)
    assert st.has_parameter(stnp.shower_energy)
    va = np.asarray(st[stnp.viewing_angles])
    assert va.shape == (4, 2)
