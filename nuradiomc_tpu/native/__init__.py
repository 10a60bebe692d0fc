"""Native (C++) host-runtime components, loaded via ctypes.

The shared library is compiled on first use (mirroring the reference's
on-the-fly build of its C++ ray tracer, analyticraytracing.py:24-41) and
cached next to the sources. Python fallbacks keep everything functional when
no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger("nuradiomc_tpu.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libbatch_builder.so")
_SRC = os.path.join(_HERE, "batch_builder.cpp")

_lib = None
_load_attempted = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.group_showers.restype = ctypes.c_int64
        lib.group_showers.argtypes = [i64p, ctypes.c_int64, i64p, i64p, i64p, i64p]
        lib.pad_column.restype = None
        lib.pad_column.argtypes = [f64p, i64p, i64p, i64p,
                                   ctypes.c_int64, ctypes.c_int64,
                                   ctypes.c_double, f64p]
        lib.pad_mask.restype = None
        lib.pad_mask.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, u8p]
        _lib = lib
    except Exception as exc:  # compiler missing etc. -> python fallback
        logger.warning("native batch builder unavailable (%s); using python fallback", exc)
        _lib = None
    return _lib


def group_showers(group_ids: np.ndarray):
    """(unique_ids, start, count, order) — native when possible."""
    group_ids = np.ascontiguousarray(group_ids, dtype=np.int64)
    n = len(group_ids)
    lib = get_lib()
    if lib is None:
        order = np.argsort(group_ids, kind="stable")
        uids, start, count = np.unique(group_ids[order], return_index=True,
                                       return_counts=True)
        return uids, start.astype(np.int64), count.astype(np.int64), order.astype(np.int64)
    order = np.empty(n, dtype=np.int64)
    start = np.empty(n, dtype=np.int64)
    count = np.empty(n, dtype=np.int64)
    uids = np.empty(n, dtype=np.int64)
    n_groups = lib.group_showers(group_ids, n, order, start, count, uids)
    return uids[:n_groups], start[:n_groups], count[:n_groups], order


def pad_columns(columns: dict, order, start, count, s_max: int, fills=None):
    """Pad several per-shower float columns into [n_groups, s_max] arrays."""
    n_groups = len(start)
    out = {}
    lib = get_lib()
    fills = fills or {}
    order = np.ascontiguousarray(order, dtype=np.int64)
    start = np.ascontiguousarray(start, dtype=np.int64)
    count = np.ascontiguousarray(count, dtype=np.int64)
    for name, col in columns.items():
        fill = float(fills.get(name, 0.0))
        col = np.ascontiguousarray(col, dtype=np.float64)
        dst = np.empty((n_groups, s_max), dtype=np.float64)
        if lib is None:
            for g in range(n_groups):
                c = min(count[g], s_max)
                rows = order[start[g]:start[g] + c]
                dst[g, :c] = col[rows]
                dst[g, c:] = fill
        else:
            lib.pad_column(col, order, start, count, n_groups, s_max, fill, dst)
        out[name] = dst
    mask = np.empty((n_groups, s_max), dtype=np.uint8)
    if lib is None:
        for g in range(n_groups):
            c = min(count[g], s_max)
            mask[g, :c] = 1
            mask[g, c:] = 0
    else:
        lib.pad_mask(count, n_groups, s_max, mask)
    return out, mask.astype(bool)
