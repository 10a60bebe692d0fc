"""Bound the stochastic tau propagator against PROPOSAL's committed
decay library (VERDICT r4 missing #2 / next #8).

The reference ships ``EvtGen/decay_library.hdf5`` (created by
``EvtGen/create_tau_tab.py`` from its PROPOSAL-backed
``get_decay_time_losses(..., average=True)``): for a 100x100 grid of
(rest-frame lifetime draw, initial tau energy) it tabulates the LAB decay
time and the tau energy at decay under PROPOSAL's average energy losses.
That is the only committed PROPOSAL-derived expectation in the repository,
so it is the anchor we can quantify against.

Method: for each initial energy on the library grid, draw N rest-frame
lifetimes ~ Exp(tau_rest_lifetime) and interpolate the library ->
PROPOSAL's (decay distance, decay energy) ensemble; run our
``muon_propagation.propagate_taus`` for N taus -> our (decay distance,
energy-at-decay) ensemble. Report quantile ratios. Decay energies are
floored at 1e15 eV (the library's own floor).

    python -u tools/proposal_delta.py [N]

The measured table is published in docs/physics.md; tests/test_muon_
propagation.py::test_tau_decay_quantiles_vs_proposal_library pins it.
"""
import json
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nuradiomc_tpu.sim import muon_propagation as mp
from nuradiomc_tpu.utils import constants

LIB = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "decay_library.hdf5")
E_FLOOR = 1e15                      # the library's decay-energy floor [eV]
QUANTILES = (0.1, 0.5, 0.9)


def proposal_ensemble(E0_idx, n, rng):
    """PROPOSAL's (decay distance [m], decay energy [eV]) ensemble at the
    library energy column ``E0_idx``: lifetime draws ~ Exp(tau lifetime),
    log-time interpolation of the committed average-loss table."""
    with h5py.File(LIB) as f:
        rest_times = f["rest_times"][:]            # [ns]
        decay_times = f["decay_times"][:, E0_idx]  # lab, [ns]
        decay_energies = f["decay_energies"][:, E0_idx]  # [eV]
        E0 = f["initial_energies"][E0_idx]

    t_rest = rng.exponential(constants.tau_rest_lifetime, n)
    lt = np.log(np.clip(t_rest, rest_times[0], rest_times[-1]))
    t_lab = np.interp(lt, np.log(rest_times), decay_times)
    e_dec = np.exp(np.interp(lt, np.log(rest_times),
                             np.log(decay_energies)))
    dist = t_lab * constants.speed_of_light       # ultra-relativistic
    return E0, dist, np.maximum(e_dec, E_FLOOR)


def ours_ensemble(E0, n, rng):
    _, decay_info = mp.propagate_taus(np.full(n, E0), 1e12, rng=rng,
                                      shower_energy_threshold=np.inf,
                                      e_tau_min=0.0)
    dist = np.array([d[0] for d in decay_info if d[0] is not None])
    e_dec = np.array([d[2] for d in decay_info if d[0] is not None])
    return dist, np.maximum(e_dec, E_FLOOR)


def ours_average_trajectory(E0, t_rest_samples):
    """Deterministic AVERAGE-loss trajectory under our calibrated b(E) —
    the like-for-like comparison against the library (which tabulates
    PROPOSAL's average=True trajectories): integrate
    dE/dX = -(a + b(E) E) and proper time dtau = m dx / (c E), then map
    each lifetime draw to (decay distance, decay energy)."""
    n_steps = 20000
    dx = 1e12 / n_steps                       # m; ~50 km of ice suffices
    dx = min(dx, 5.0)
    E = float(E0)
    xs = [0.0]
    taus = [0.0]
    Es = [E]
    x = 0.0
    for _ in range(200000):
        b = float(mp.tau_b_total(E))
        dX = dx * mp.M_TO_GCM2
        dE = (mp.A_ION + b * E) * dX
        taus.append(taus[-1] + mp.constants.tau_mass * dx
                    / (mp.constants.speed_of_light * E))
        E = max(E - dE, E_FLOOR * 0.5)
        x += dx
        xs.append(x)
        Es.append(E)
        if E <= E_FLOOR * 0.6 or taus[-1] > 1e3:
            break
    xs, taus, Es = map(np.asarray, (xs, taus, Es))
    t = np.clip(t_rest_samples, taus[0], taus[-1])
    dist = np.interp(t, taus, xs)
    e_dec = np.exp(np.interp(t, taus, np.log(Es)))
    return dist, np.maximum(e_dec, E_FLOOR)


def compare(n=20000, e_indices=(20, 40, 60, 80, 99), seed=7):
    """Two layers per energy:

    * ``avg_*``   — our deterministic average-loss trajectory vs the
      library's: isolates the LOSS-MODEL delta (the b(E) calibration is
      derived from this very library, so these should sit at the few-%
      level — interpolation and a-term differences only).
    * ``sto_*``   — our full stochastic ensemble vs the average-loss
      library: the spread is dominated by genuine loss stochasticity
      (median log-energy decays pi^2/6 ~ 1.64x faster than the mean for
      a 1/v catastrophic spectrum), which PROPOSAL's own stochastic runs
      share but the committed average=True library cannot show.
    """
    rng = np.random.default_rng(seed)
    rows = []
    for idx in e_indices:
        E0, p_dist, p_e = proposal_ensemble(idx, n, rng)
        t_rest = rng.exponential(mp.constants.tau_rest_lifetime, n)
        a_dist, a_e = ours_average_trajectory(E0, t_rest)
        o_dist, o_e = ours_ensemble(E0, n, rng)
        row = {"E0_eV": float(E0),
               "decay_fraction_ours": len(o_dist) / n}
        for q in QUANTILES:
            row[f"avg_dist_q{int(q * 100)}"] = float(
                np.quantile(a_dist, q) / np.quantile(p_dist, q))
            row[f"avg_edec_q{int(q * 100)}"] = float(
                np.quantile(a_e, q) / np.quantile(p_e, q))
            row[f"sto_dist_q{int(q * 100)}"] = float(
                np.quantile(o_dist, q) / np.quantile(p_dist, q))
            row[f"sto_edec_q{int(q * 100)}"] = float(
                np.quantile(o_e, q) / np.quantile(p_e, q))
        rows.append(row)
    return rows


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    rows = compare(n)
    for kind in ("avg", "sto"):
        print(f"\n{kind}: ours/{ 'library' }")
        print("| E0 [eV] | dist q10 | dist q50 | dist q90 "
              "| Edec q10 | Edec q50 | Edec q90 |")
        print("|---|---|---|---|---|---|---|")
        for r in rows:
            print("| {:.1e} | {:.3f} | {:.3f} | {:.3f} | {:.3f} | {:.3f} "
                  "| {:.3f} |".format(
                      r["E0_eV"], r[f"{kind}_dist_q10"],
                      r[f"{kind}_dist_q50"], r[f"{kind}_dist_q90"],
                      r[f"{kind}_edec_q10"], r[f"{kind}_edec_q50"],
                      r[f"{kind}_edec_q90"]))
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
