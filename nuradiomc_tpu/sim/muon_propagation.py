"""Stochastic muon propagation in ice (simplified PROPOSAL replacement).

The reference delegates muon/tau secondary generation to the external
PROPOSAL C++ propagator (EvtGen/NuRadioProposal.py).  This module implements
the standard high-energy muon energy-loss treatment directly:

    <dE/dX> = a + b(E) E,   a ~ ionization, b ~ brems + pair + photonuclear

with the radiative part sampled STOCHASTICALLY above a relative-loss cut
v_cut from the 1/v spectrum (dN/dX dv = b/v, whose first moment integrates
back to bE per g/cm^2) and the sub-cut remainder (a + b v_cut E) applied
continuously.  Each stochastic loss above the shower threshold becomes a
secondary shower ('em' for brems/pair, 'had' for photonuclear).

This is a *documented approximation*: it reproduces the mean energy-loss
profile and the 1/v catastrophic-loss statistics that drive radio-detectable
showers, but not PROPOSAL's exact differential cross sections.

Loss parameters (water/ice, PDG-style high-energy values):
a = 2.67e-3 GeV cm^2/g; b = (1.6 brems + 1.5 pair + 0.4 photonucl) x 1e-6
cm^2/g.
"""

from __future__ import annotations

import numpy as np

from nuradiomc_tpu.utils import units

# energy-loss parameters in ice (per g/cm^2)
A_ION = 2.67e-3 * units.GeV            # GeV cm^2/g
B_BREMS = 1.6e-6
B_PAIR = 1.5e-6
B_PHOTONUCL = 0.4e-6
B_TOTAL = B_BREMS + B_PAIR + B_PHOTONUCL
RHO_ICE = 0.917                        # g/cm^3
M_TO_GCM2 = RHO_ICE * 100.0            # column depth per meter of ice


def csda_mean_energy(E0, X):
    """Analytic continuous-slowing-down mean energy after column depth X
    (g/cm^2): E(X) = (E0 + a/b) exp(-bX) - a/b."""
    return (E0 + A_ION / B_TOTAL) * np.exp(-B_TOTAL * np.asarray(X)) \
        - A_ION / B_TOTAL


def propagate_muons(energies, max_length, rng=None, v_cut=1e-3,
                    shower_energy_threshold=1e15, e_mu_min=1e14,
                    max_steps=2000):
    """Propagate muons through ice, returning their stochastic losses.

    Parameters
    ----------
    energies : (N,) initial muon energies (internal units, eV)
    max_length : float or (N,) maximum geometric track length [m]
    v_cut : relative-loss threshold between continuous and stochastic
    shower_energy_threshold : record losses above this energy as showers
    e_mu_min : stop tracking below this muon energy

    Returns
    -------
    losses : list over muons of (distance [m], shower_energy, shower_type)
    final_energies : (N,) muon energy at the end of the track (0 if stopped)
    """
    rng = rng or np.random.default_rng()
    energies = np.asarray(energies, dtype=float)
    N = len(energies)
    max_length = np.broadcast_to(np.asarray(max_length, dtype=float), (N,))

    E = energies.copy()
    X_pos = np.zeros(N)                       # column depth travelled
    X_max = max_length * M_TO_GCM2
    alive = E > e_mu_min
    losses = [[] for _ in range(N)]

    rate = B_TOTAL * np.log(1.0 / v_cut)      # stochastic interactions per g/cm^2
    p_had = B_PHOTONUCL / B_TOTAL

    for _ in range(max_steps):
        if not alive.any():
            break
        idx = np.where(alive)[0]
        # distance to the next stochastic interaction
        dX = rng.exponential(1.0 / rate, len(idx))
        X_new = X_pos[idx] + dX
        ends = X_new > X_max[idx]
        dX_eff = np.where(ends, X_max[idx] - X_pos[idx], dX)

        # continuous losses over the step: dE/dX = -(a + b v_cut E)
        bc = B_TOTAL * v_cut
        E_after = (E[idx] + A_ION / bc) * np.exp(-bc * dX_eff) - A_ION / bc
        E_after = np.maximum(E_after, 0.0)
        X_pos[idx] += dX_eff
        E[idx] = E_after

        stopped = E[idx] <= e_mu_min
        finished = ends | stopped
        alive[idx[finished]] = False

        # stochastic loss for the still-alive ones: v from 1/v on [v_cut, 1)
        act = idx[~finished]
        if len(act):
            u = rng.random(len(act))
            v = v_cut ** (1.0 - u)            # inverse CDF of 1/v spectrum
            dE = v * E[act]
            is_had = rng.random(len(act)) < p_had
            for j, k in enumerate(act):
                if dE[j] >= shower_energy_threshold:
                    losses[k].append((X_pos[k] / M_TO_GCM2, dE[j],
                                      "had" if is_had[j] else "em"))
            E[act] = E[act] - dE
            newly_dead = E[act] <= e_mu_min
            alive[act[newly_dead]] = False

    return losses, np.where(E > e_mu_min, E, 0.0)
