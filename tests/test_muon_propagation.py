"""Stochastic muon propagator (simplified PROPOSAL replacement,
sim/muon_propagation.py) + surface-muon generation with multi-shower groups."""
import numpy as np

from nuradiomc_tpu.sim import muon_propagation as mp
from nuradiomc_tpu.utils import units


def test_mean_energy_matches_csda():
    """The stochastic + continuous treatment must reproduce the analytic
    mean energy-loss profile <E(X)> = (E0 + a/b) exp(-bX) - a/b."""
    rng = np.random.default_rng(0)
    E0 = 1e18
    length = 2000.0                       # m of ice
    N = 3000
    _, E_final = mp.propagate_muons(np.full(N, E0), length, rng=rng,
                                    shower_energy_threshold=1e30)
    X = length * mp.M_TO_GCM2
    expected = mp.csda_mean_energy(E0, X)
    assert abs(np.mean(E_final) / expected - 1) < 0.05


def test_stochastic_loss_budget():
    """Mean stochastic loss per column depth ~ b_total * E."""
    rng = np.random.default_rng(1)
    E0 = 1e18
    length = 50.0                          # short: E ~ constant
    N = 4000
    losses, E_final = mp.propagate_muons(
        np.full(N, E0), length, rng=rng, shower_energy_threshold=0.0)
    total_stochastic = sum(e for ll in losses for (_, e, _) in ll)
    X = length * mp.M_TO_GCM2
    # expected: b (1 - v_cut) E X ~ b E X
    expected = mp.B_TOTAL * E0 * X * N
    assert abs(total_stochastic / expected - 1) < 0.1


def test_loss_type_fractions():
    rng = np.random.default_rng(2)
    losses, _ = mp.propagate_muons(np.full(2000, 1e18), 200.0, rng=rng,
                                   shower_energy_threshold=0.0)
    kinds = [k for ll in losses for (_, _, k) in ll]
    frac_had = np.mean([k == "had" for k in kinds])
    assert abs(frac_had - mp.B_PHOTONUCL / mp.B_TOTAL) < 0.03


def test_surface_muons_stochastic_groups(tmp_path):
    import h5py

    from nuradiomc_tpu.sim.evtgen import generate_surface_muons

    volume = {"fiducial_rmin": 0, "fiducial_rmax": 2 * units.km,
              "fiducial_zmin": -2.7 * units.km, "fiducial_zmax": 0}
    out = str(tmp_path / "muons.hdf5")
    data, attrs = generate_surface_muons(out, 300, 1e18, 1e18, volume,
                                         thetamax=np.deg2rad(60.0), seed=5,
                                         secondaries="stochastic")
    assert len(data["xx"]) > 0
    # multi-shower event groups exist
    _, counts = np.unique(data["event_group_ids"], return_counts=True)
    assert counts.max() > 1
    # all shower vertices inside the volume
    assert np.all(np.hypot(data["xx"], data["yy"]) <= 2000.0 + 1e-6)
    assert np.all(data["zz"] >= -2700.0)
    assert set(np.unique(data["shower_type"])) <= {"em", "had"}
    # shower energies above the default threshold
    assert np.min(data["shower_energies"]) >= 1e15
    with h5py.File(out) as f:
        assert f.attrs["n_events"] == 300


def test_muon_events_through_full_simulation(tmp_path):
    """Multi-shower muon event groups run through the complete pipeline
    (several showers of one group summed in one trace window)."""
    import jax.numpy as jnp

    from nuradiomc_tpu.sim.evtgen import generate_surface_muons
    from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec
    from test_e2e import DETECTOR

    volume = {"fiducial_rmin": 0, "fiducial_rmax": 2 * units.km,
              "fiducial_zmin": -2.7 * units.km, "fiducial_zmax": 0}
    inp = str(tmp_path / "muons.hdf5")
    generate_surface_muons(inp, 400, 3e18, 3e18, volume,
                           thetamax=np.deg2rad(60.0), seed=9,
                           secondaries="stochastic")

    out = str(tmp_path / "out.hdf5")
    sim = Simulation(
        inp, DETECTOR,
        config={"sampling_rate": 2.0,
                "propagation": {"ice_model": "southpole_2015"},
                "signal": {"model": "Alvarez2000"},
                "weights": {"weight_mode": "None",
                            "cross_section_type": "ctw"}},
        filter_chain=[
            FilterStage((80 * units.MHz, 1000 * units.GHz), "butter", {"order": 2}),
            FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
        ],
        # noiseless run: a low threshold keeps the test fast with few muons
        trigger=TriggerSpec(threshold_high_sigma=0.5, threshold_low_sigma=-0.5),
        antenna_replacements={
            "XFDTD_Vpol_CrossFeed_150mmHole_n1.78": "analytic_VPol"},
        chunk_size=256, dtype=jnp.float64, outputfilename=out)
    res = sim.run()
    assert len(res["triggered"]) > 0
    assert res["triggered"].sum() > 0        # 3 EeV muons do trigger
    import h5py
    with h5py.File(out) as f:
        gids = np.asarray(f["event_group_ids"])
        _, counts = np.unique(gids, return_counts=True)
        assert counts.max() > 1              # multi-shower groups persisted


# ---------------------------------------------------------------------------
# tau propagation + decay (reference: NuRadioProposal.get_decays and
# inelasticities.py:160-271)
# ---------------------------------------------------------------------------

def test_tau_decay_branches_and_energies():
    """Branch ratios 0.18/0.18/0.64 and product energies within kinematic
    bounds (product energy <= E_tau, positive)."""
    rng = np.random.default_rng(2)
    E = 1e18
    kinds, fracs = [], []
    for _ in range(3000):
        kind, e_prod = mp.sample_tau_decay(E, rng)
        kinds.append(kind)
        fracs.append(e_prod / E)
    kinds = np.array(kinds)
    fracs = np.array(fracs)
    assert abs(np.mean(kinds == "mu") - 0.18) < 0.03
    assert abs(np.mean(kinds == "em") - 0.18) < 0.03
    assert abs(np.mean(kinds == "had") - 0.64) < 0.03
    assert np.all(fracs > 0) and np.all(fracs <= 1.0)
    # leptonic mean fraction ~ <y_lab> = 0.35-0.40 for massless limit
    lep = fracs[kinds != "had"]
    assert 0.25 < np.mean(lep) < 0.5
    # hadronic fraction: mean (1-y) around 0.55-0.75
    had = fracs[kinds == "had"]
    assert 0.45 < np.mean(had) < 0.8


def test_tau_decay_length_statistics():
    """With losses made negligible, the decay distance must follow an
    exponential with mean gamma c tau."""
    from nuradiomc_tpu.utils import constants
    rng = np.random.default_rng(3)
    E = 1e17                                # gamma c tau ~ 4.9 km
    N = 800
    _, decay_info = mp.propagate_taus(np.full(N, E), 1e9, rng=rng,
                                      shower_energy_threshold=1e30)
    dists = np.array([d[0] for d in decay_info if d[0] is not None])
    assert len(dists) > N * 0.95
    expected = (E / constants.tau_mass) * constants.tau_rest_lifetime \
        * constants.speed_of_light
    # the PROPOSAL-calibrated b(1e17 eV) = 4.5e-7 cm^2/g shifts the mean
    # ~16% below the loss-free gamma*c*tau (stronger than the old constant
    # b = 2.86e-7); the mean must sit BELOW but within 25%
    ratio = np.mean(dists) / expected
    assert 0.75 < ratio < 1.0


def test_tau_secondaries_in_eventlist():
    """nu_tau CC events get tau-track secondary showers (n_interaction>=2)
    in the same event group; nu_e NC-only events stay single-shower."""
    from nuradiomc_tpu.sim import evtgen
    volume = {"fiducial_rmin": 0, "fiducial_rmax": 5 * units.km,
              "fiducial_zmin": -3 * units.km, "fiducial_zmax": 0}
    data, _ = evtgen.generate_eventlist_cylinder(
        None, 200, 1e19, 1e19, volume, flavor=(16, -16),
        interaction_type="cc", seed=42, secondaries="stochastic")
    assert np.any(data["n_interaction"] >= 2), "no tau secondaries inserted"
    sec = data["n_interaction"] >= 2
    # secondaries inherit the parent flavor and carry positive shower energy
    assert np.all(np.abs(data["flavors"][sec]) == 16)
    assert np.all(data["shower_energies"][sec] > 0)
    assert set(np.unique(data["shower_type"][sec])) <= {"em", "had"}
    # rows remain sorted by event group and shower_ids are consecutive
    assert np.all(np.diff(data["event_group_ids"]) >= 0)
    assert np.all(np.diff(data["shower_ids"]) == 1)
    # secondaries are displaced from the primary vertex along the track
    for g in np.unique(data["event_group_ids"][sec])[:5]:
        grp = data["event_group_ids"] == g
        assert len(np.unique(data["xx"][grp])) > 1


def test_nuradio_proposal_api():
    """NuRadioProposal-compatible wrapper (sim/nuradio_proposal.py): same
    entry points as the reference's PROPOSAL interface, backed by the
    stochastic propagators."""
    from nuradiomc_tpu.sim.nuradio_proposal import ProposalFunctions, SecondaryProperties

    pf = ProposalFunctions(seed=5)
    # muons: losses only, time-ordered, codes in the private range
    secs = pf.get_secondaries_array([1e19, 1e19], [13, -13],
                                    min_energy_loss_nu=1e15,
                                    propagation_length_nu=5000.0)
    assert len(secs) == 2
    assert all(isinstance(s, SecondaryProperties) for s in secs[0])
    assert any(len(s) > 0 for s in secs)
    for track in secs:
        dists = [s.distance for s in track]
        assert dists == sorted(dists)
        assert all(s.code in (81, 83, 85) for s in track)
        assert all(s.shower_type in ("em", "had") for s in track)
        assert all(s.parent_energy == 1e19 for s in track)
    # taus: decay products appear (hadrons code 86 or e- code 11)
    secs_tau = pf.get_secondaries_array([1e18] * 30, [15] * 30,
                                        min_energy_loss_nu=1e15,
                                        propagation_length_nu=1e6)
    codes = {s.code for track in secs_tau for s in track}
    assert 86 in codes or 11 in codes
    # get_decays: tau decay distances follow gamma*c*tau scale
    decays = pf.get_decays([1e17] * 50, [15] * 50, propagation_length_nu=1e9)
    dists = np.array([d for d, _ in decays if d is not None])
    assert len(dists) > 40
    assert 1000 < np.mean(dists) < 20000   # gamma c tau ~ 4.9 km at 1e17 eV
    # non-tau inputs yield (None, None)
    assert pf.get_decays([1e17], [13]) == [(None, None)]
    str(secs_tau[0][0]) if secs_tau[0] else None


def test_time_gap_event_splitting(tmp_path):
    """Showers of one event group separated by >split_event_time_diff are
    simulated as separate events (group_into_events semantics,
    simulation.py:906-1016): a far-displaced late secondary must not share a
    trace window with the prompt shower, and the group weight counts once."""
    import h5py
    import jax.numpy as jnp
    from test_e2e import DETECTOR
    from nuradiomc_tpu.sim.simulation import FilterStage, Simulation, TriggerSpec

    # two showers in one group: identical prompt positions + one 3 km / 10 us
    # late secondary
    infile = str(tmp_path / "in.hdf5")
    with h5py.File(infile, "w") as f:
        f["event_group_ids"] = np.array([1, 1, 2])
        f["xx"] = np.array([0.0, 0.0, 100.0])
        f["yy"] = np.array([0.0, 3000.0, 0.0])
        f["zz"] = np.array([-500.0, -500.0, -600.0])
        f["vertex_times"] = np.array([0.0, 1.2e4, 0.0])
        f["azimuths"] = np.zeros(3)
        f["zeniths"] = np.full(3, np.pi / 2)
        f["energies"] = np.full(3, 1e18)
        f["shower_energies"] = np.full(3, 1e18)
        f["flavors"] = np.array([14, 14, 14])
        f["n_interaction"] = np.array([1, 2, 1])
        f["interaction_type"] = np.array([b"cc", b"had", b"cc"])
        f["inelasticity"] = np.full(3, 0.5)
        f["shower_type"] = np.array([b"had", b"had", b"had"])
        f["shower_ids"] = np.arange(3)
        f.attrs["n_events"] = 2
        f.attrs["volume"] = 1e9
        f.attrs["thetamin"] = 0.0
        f.attrs["thetamax"] = np.pi

    sim = Simulation(
        infile, DETECTOR,
        config={"sampling_rate": 2.0, "split_event_time_diff": 1e3,
                "propagation": {"ice_model": "southpole_2015"},
                "signal": {"model": "Alvarez2000"}},
        filter_chain=[FilterStage((80 * units.MHz, 1000 * units.GHz), "butter", {"order": 2}),
                      FilterStage((0, 500 * units.MHz), "butter", {"order": 10})],
        trigger=TriggerSpec(threshold_high_sigma=2.0, threshold_low_sigma=-2.0),
        antenna_replacements={"XFDTD_Vpol_CrossFeed_150mmHole_n1.78": "analytic_VPol"},
        chunk_size=8, dtype=jnp.float64)
    res = sim.run()
    # group 1 split into two sub-events + group 2 -> 3 rows
    assert len(res["group_ids"]) == 3
    assert list(res["group_ids"]).count(1) == 2
    # weight of group 1 enters the Veff sum at most once
    assert res["n_triggered"] <= 2


def test_tau_decay_quantiles_vs_proposal_library():
    """The tau loss model is calibrated to the reference's committed
    PROPOSAL decay library (EvtGen/decay_library.hdf5 -> tests/golden/):
    our AVERAGE-loss trajectory must reproduce the library's
    (decay distance, decay energy) quantiles to <= 10% at every energy
    (tools/proposal_delta.py measured <= 5%); the stochastic ensemble's
    median decay distance sits below the average-loss curve by the
    documented pi^2/6 log-energy effect but within [0.55, 1.15]."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "proposal_delta",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "proposal_delta.py"))
    pd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pd)

    rows = pd.compare(n=3000, e_indices=(40, 80), seed=7)
    for r in rows:
        for q in (10, 50, 90):
            assert abs(r[f"avg_dist_q{q}"] - 1) < 0.10, r
            assert abs(r[f"avg_edec_q{q}"] - 1) < 0.10, r
        assert 0.55 < r["sto_dist_q50"] < 1.15, r
