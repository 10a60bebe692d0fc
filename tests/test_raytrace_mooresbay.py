"""Moore's Bay (reflective bottom) ray-tracing conformance.

Golden data from running the reference tracer with mooresbay_simple ice and
n_reflections=1 (tests/golden/generate_mooresbay_golden.py). The batched
solver must find every solution the reference finds, at matching C0 /
observables. It additionally finds bottom-reflection solutions (mostly
reflection_case=2, i.e. rays starting downward) that the reference's
scipy-root search misses; those extras were verified offline against the
reference's own get_delta_y objective (|delta_y| < 1e-4 m for every one),
so completeness beyond the golden set is expected and correct.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nuradiomc_tpu.models import ice as ice_models
from nuradiomc_tpu.ops import raytrace

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "raytrace_mb.npz")


@pytest.fixture(scope="module")
def data():
    g = np.load(GOLDEN)
    ice = ice_models.mooresbay_simple
    x1 = jnp.asarray(g["points"])
    x2 = jnp.broadcast_to(jnp.asarray(g["receiver"]), x1.shape)
    geom = raytrace.to_2d(x1, x2)
    solve = jax.jit(jax.vmap(
        lambda a, b, c, d: raytrace.find_solutions_all(a, b, c, d, ice, n_reflections=1)))
    sols = solve(geom.x1y, geom.x1z, geom.x2y, geom.x2z)
    return g, geom, sols


def _match_stats(g, sols, r, case, field=None, ref_field=None):
    mask = np.asarray(sols.mask)
    c0 = np.asarray(sols.c0)
    my_r = np.asarray(sols.reflection)
    my_case = np.asarray(sols.refl_case)
    ref_has = ~np.isnan(g["C0"])
    matched = missed = 0
    errs = []
    for i in range(len(g["points"])):
        ref_sel = (g["reflection"][i] == r) & ref_has[i]
        if r > 0:
            ref_sel &= g["refl_case"][i] == case
        my_sel = mask[i] & (my_r[i] == r)
        if r > 0:
            my_sel &= my_case[i] == case
        for j in np.where(ref_sel)[0]:
            rv = g["C0"][i, j]
            cands = np.where(my_sel)[0]
            rel = np.abs(c0[i][cands] / rv - 1)
            if len(rel) and rel.min() < 1e-6:
                matched += 1
                if field is not None:
                    k = cands[np.argmin(rel)]
                    mine = np.asarray(field)[i, k]
                    ref = g[ref_field][i, j]
                    errs.append((mine, ref))
            else:
                missed += 1
    return matched, missed, errs


def test_all_reference_solutions_found(data):
    g, _, sols = data
    for (r, case) in [(0, 1), (1, 1), (1, 2)]:
        matched, missed, _ = _match_stats(g, sols, r, case)
        assert missed == 0, f"(r={r}, case={case}): missed {missed}"
    total_ref = int(np.sum(~np.isnan(g["C0"])))
    assert total_ref > 300  # sanity: the golden file is non-trivial


def test_reflected_observables_match(data):
    g, _, sols = data
    for (r, case) in [(1, 1), (1, 2)]:
        _, _, errs = _match_stats(g, sols, r, case, sols.travel_time, "travel_time")
        mine = np.array([e[0] for e in errs])
        ref = np.array([e[1] for e in errs])
        np.testing.assert_allclose(mine, ref, rtol=1e-6)
        _, _, errs = _match_stats(g, sols, r, case, sols.path_length, "path_length")
        mine = np.array([e[0] for e in errs])
        ref = np.array([e[1] for e in errs])
        np.testing.assert_allclose(mine, ref, rtol=1e-6)


def test_reflected_launch_vectors(data):
    g, geom, sols = data
    launch, receive = raytrace.launch_receive_vectors(geom, sols)
    for (r, case) in [(1, 1), (1, 2)]:
        _, _, errs = _match_stats(g, sols, r, case, np.asarray(launch), "launch")
        for mine, ref in errs:
            np.testing.assert_allclose(mine, ref, atol=1e-6)
