"""Native C++ batch builder: compiles, matches the Python fallback, and is
used by the simulation batch path."""
import numpy as np

from nuradiomc_tpu import native


def test_native_lib_builds():
    assert native.get_lib() is not None, "g++ build of the native lib failed"


def test_group_showers_matches_numpy():
    rng = np.random.default_rng(0)
    gids = rng.integers(0, 500, 2000)
    uids, start, count, order = native.group_showers(gids)
    # reference computation
    order_ref = np.argsort(gids, kind="stable")
    uids_ref, start_ref, count_ref = np.unique(gids[order_ref], return_index=True,
                                               return_counts=True)
    np.testing.assert_array_equal(uids, uids_ref)
    np.testing.assert_array_equal(start, start_ref)
    np.testing.assert_array_equal(count, count_ref)
    np.testing.assert_array_equal(order, order_ref)


def test_pad_columns_matches_python():
    rng = np.random.default_rng(1)
    n = 5000
    gids = rng.integers(0, 1000, n)
    col = rng.normal(size=n)
    uids, start, count, order = native.group_showers(gids)
    s_max = int(count.max())
    out, mask = native.pad_columns({"c": col}, order, start, count, s_max,
                                   fills={"c": -1.0})
    # python reference
    ref = np.full((len(uids), s_max), -1.0)
    for g in range(len(uids)):
        rows = order[start[g]:start[g] + count[g]]
        ref[g, :count[g]] = col[rows]
    np.testing.assert_array_equal(out["c"], ref)
    assert mask.sum() == n


def test_large_scale_throughput():
    """1e6 showers group+pad in well under a second (native data plane)."""
    import time
    rng = np.random.default_rng(2)
    n = 1_000_000
    gids = np.repeat(np.arange(n // 2), 2)[:n]
    col = rng.normal(size=n)
    t0 = time.perf_counter()
    uids, start, count, order = native.group_showers(gids)
    out, mask = native.pad_columns({"a": col, "b": col, "c": col},
                                   order, start, count, int(count.max()))
    elapsed = time.perf_counter() - t0
    assert len(uids) == n // 2
    assert elapsed < 5.0, elapsed
