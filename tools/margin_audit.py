"""float32 trigger-margin audit on the 3000-event dipole e2e input.

For every event group, computes the amplitude-level distance to the
high-low trigger decision boundary:

    M = max over 5-ns windows of min(window max V, -window min V)
    margin = (M - T) / T          (T = 2 sigma threshold)

at float64 AND float32 (the production/bench dtype): margin > 0 <=> the
event triggers. Reports the margin distribution, the count of events within
1%/2%/5% of the boundary, the f32-vs-f64 margin perturbation, and any
decision flips — the systematic version of the single borderline anecdote
documented in test_benchmark_settings_reproduce_golden.

    python tools/margin_audit.py          # ~4 min on the CPU host
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def sliding_minmax_margin(traces, thr, window_bins):
    """M per group: max over window positions of
    min(max V in window, -min V in window); traces [G, C, N]."""
    # windowed max/min by shift-doubling
    hi = traces.copy()
    lo = traces.copy()
    covered = 1
    while covered < window_bins:
        s = min(covered, window_bins - covered)
        hi[..., s:] = np.maximum(hi[..., s:], traces[..., :-s])
        np.maximum(hi[..., s:], hi[..., :-s], out=hi[..., s:])
        lo[..., s:] = np.minimum(lo[..., s:], traces[..., :-s])
        np.minimum(lo[..., s:], lo[..., :-s], out=lo[..., s:])
        covered += s
    m = np.minimum(hi, -lo)              # both crossings within the window
    return np.max(m, axis=(1, 2))        # over channels and positions


def run(dtype):
    import conftest  # noqa: F401  (CPU platform + x64 + compile cache)
    import jax
    import jax.numpy as jnp

    from nuradiomc_tpu.sim.pipeline import simulate_batch
    from nuradiomc_tpu.sim.simulation import (FilterStage, Simulation,
                                              TriggerSpec)
    from nuradiomc_tpu.utils import units
    from test_e2e import DETECTOR, INPUT

    cfg_fast = ({"n_freq": 16, "attenuation_steps": 8, "n_bisect": 28}
                if dtype == jnp.float32 else {})
    sim = Simulation(
        INPUT, DETECTOR,
        config={"sampling_rate": 2.0,
                "propagation": {"ice_model": "southpole_2015", **cfg_fast},
                "signal": {"model": "Alvarez2000"},
                "weights": {"weight_mode": "core_mantle_crust_simple",
                            "cross_section_type": "ctw"}},
        filter_chain=[
            FilterStage((80 * units.MHz, 1000 * units.GHz), "butter",
                        {"order": 2}),
            FilterStage((0, 500 * units.MHz), "butter", {"order": 10}),
        ],
        trigger=TriggerSpec(threshold_high_sigma=2.0, threshold_low_sigma=-2.0),
        antenna_replacements={
            "XFDTD_Vpol_CrossFeed_150mmHole_n1.78": "analytic_VPol"},
        chunk_size=512, dtype=dtype)

    group_ids, start, count, order, batch = sim._build_batches()
    G = batch.energies.shape[0]
    thr = 2.0 * sim.Vrms
    window_bins = max(int(round(sim.trigger.highlow_coincidence
                                * sim.internal_rate)), 1)

    step = jax.jit(lambda b: simulate_batch(
        b, sim.channel_params, sim.settings, keep_traces=True).traces)

    M = np.zeros(G)
    cs = 512
    for i0 in range(0, G, cs):
        sl = slice(i0, min(i0 + cs, G))
        n_pad = cs - (sl.stop - sl.start)
        chunk = jax.tree.map(
            lambda a: np.pad(np.asarray(a)[sl],
                             [(0, n_pad)] + [(0, 0)] * (a.ndim - 1)), batch)
        traces = np.asarray(step(chunk))[:sl.stop - sl.start]
        M[sl] = sliding_minmax_margin(traces, thr, window_bins)
    weights = sim._weights(group_ids, start, count, order)
    return group_ids, (M - thr) / thr, weights


def main():
    import jax.numpy as jnp

    gid64, margin64, w = run(jnp.float64)
    gid32, margin32, _ = run(jnp.float32)
    assert (gid64 == gid32).all()
    sel = w >= 1e-5

    trig64 = margin64 > 0
    trig32 = margin32 > 0
    flips = np.where((trig64 != trig32) & sel)[0]
    d = margin32 - margin64

    def frac_within(x):
        return int(np.sum(sel & (np.abs(margin64) < x)))

    out = {
        "n_groups": int(sel.sum()),
        "n_triggered_f64": int(np.sum(trig64 & sel)),
        "n_triggered_f32": int(np.sum(trig32 & sel)),
        "decision_flips": [int(gid64[i]) for i in flips],
        "flip_margins_f64": [round(float(margin64[i]), 5) for i in flips],
        "n_within_1pct_of_threshold": frac_within(0.01),
        "n_within_2pct_of_threshold": frac_within(0.02),
        "n_within_5pct_of_threshold": frac_within(0.05),
        "f32_margin_perturbation_p50": round(float(np.median(np.abs(d[sel]))), 6),
        "f32_margin_perturbation_p99": round(
            float(np.quantile(np.abs(d[sel]), 0.99)), 6),
        "f32_margin_perturbation_max": round(float(np.max(np.abs(d[sel]))), 6),
        "min_abs_margin_excl_flips": round(float(np.min(
            np.abs(margin64[sel & (np.abs(margin64) > 0)
                            & ~np.isin(np.arange(len(sel)), flips)]))), 5),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
