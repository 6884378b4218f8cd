"""ctypes bindings for the pvsg_native C++ runtime library.

The reference stack obtained these primitives from pip-installed native
extensions (pycocotools RLE codec, lap.lapjv, cython_bbox, scipy LAP — see
SURVEY.md §2.9). Here they live in one in-repo C++ library built on demand.

Every binding has a pure-numpy fallback so the framework keeps working on
machines without a C++ toolchain; the native path is the fast one used in
production.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libpvsg_native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "pvsg_native.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", src, "-o", _SO_PATH],
            check=True, capture_output=True, timeout=300,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Return the loaded native library, building it if necessary, or None."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH) or (
            os.path.exists(os.path.join(_NATIVE_DIR, "pvsg_native.cpp"))
            and os.path.getmtime(_SO_PATH)
            < os.path.getmtime(os.path.join(_NATIVE_DIR, "pvsg_native.cpp"))
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        c_u32p = ctypes.POINTER(ctypes.c_uint32)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_dp = ctypes.POINTER(ctypes.c_double)
        c_ip = ctypes.POINTER(ctypes.c_int)

        lib.rle_encode_to_string.restype = ctypes.c_int64
        lib.rle_encode_to_string.argtypes = [c_u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p]
        lib.rle_decode_from_string.restype = None
        lib.rle_decode_from_string.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, c_u8p]
        lib.rle_area_from_string.restype = ctypes.c_int64
        lib.rle_area_from_string.argtypes = [ctypes.c_char_p]
        lib.rle_iou_from_strings.restype = ctypes.c_double
        lib.rle_iou_from_strings.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.lapjv.restype = ctypes.c_double
        lib.lapjv.argtypes = [ctypes.c_int, ctypes.c_int, c_dp, ctypes.c_double, c_ip, c_ip]
        lib.hungarian.restype = ctypes.c_int
        lib.hungarian.argtypes = [ctypes.c_int, ctypes.c_int, c_dp, c_ip, c_ip]
        lib.pairwise_mask_iou.restype = None
        lib.pairwise_mask_iou.argtypes = [c_i32p, c_i32p, ctypes.c_int64,
                                          ctypes.c_int32, ctypes.c_int32, c_dp]
        lib.rle_counts_to_string.restype = ctypes.c_int64
        lib.rle_counts_to_string.argtypes = [c_u32p, ctypes.c_int64, ctypes.c_char_p]
        lib.rle_string_to_counts.restype = ctypes.c_int64
        lib.rle_string_to_counts.argtypes = [ctypes.c_char_p, c_u32p]
        _lib = lib
        return _lib


def have_native() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# Assignment solvers
# ---------------------------------------------------------------------------

def lapjv(cost: np.ndarray, cost_limit: float = np.inf):
    """lap.lapjv-compatible assignment with cost limit.

    Returns (total_cost, x, y) where x[i] is the column matched to row i
    (or -1) and y[j] the row matched to column j (or -1). Matches whose cost
    exceeds cost_limit are left unassigned (reference semantics:
    models/unitrack/core/association/matching.py:29-40 with extend_cost=True).
    """
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    nr, nc = cost.shape
    if nr == 0 or nc == 0:
        return 0.0, -np.ones(nr, dtype=np.int32), -np.ones(nc, dtype=np.int32)
    lib = get_lib()
    if lib is not None:
        x = np.empty(nr, dtype=np.int32)
        y = np.empty(nc, dtype=np.int32)
        total = lib.lapjv(
            nr, nc,
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            float(cost_limit),
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return float(total), x, y
    # Fallback: scipy on the padded square matrix (same construction).
    from scipy.optimize import linear_sum_assignment

    n = nr + nc
    pad = (cost_limit / 2.0) if np.isfinite(cost_limit) else (cost.max() + 1.0 if cost.size else 1.0)
    big = np.full((n, n), pad, dtype=np.float64)
    big[:nr, :nc] = cost
    big[nr:, nc:] = 0.0
    ri, ci = linear_sum_assignment(big)
    x = -np.ones(nr, dtype=np.int32)
    y = -np.ones(nc, dtype=np.int32)
    for i, j in zip(ri, ci):
        if i < nr and j < nc:
            x[i] = j
            y[j] = i
    total = float(sum(cost[i, x[i]] for i in range(nr) if x[i] >= 0))
    return total, x, y


def linear_sum_assignment(cost: np.ndarray):
    """scipy-compatible rectangular min-cost assignment (row_ind, col_ind)."""
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    nr, nc = cost.shape
    if nr == 0 or nc == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    lib = get_lib()
    if lib is not None and np.isfinite(cost).all():
        k = min(nr, nc)
        ri = np.empty(k, dtype=np.int32)
        ci = np.empty(k, dtype=np.int32)
        got = lib.hungarian(
            nr, nc,
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ri.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ci.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return ri[:got].astype(np.int64), ci[:got].astype(np.int64)
    import scipy.optimize

    return scipy.optimize.linear_sum_assignment(cost)


def pairwise_mask_iou(gt: np.ndarray, pred: np.ndarray, n_gt: int, n_pred: int) -> np.ndarray:
    """IoU matrix between every (gt label, pred label) pair of two dense-id
    label maps (-1 = background/ignore). Single pass over pixels in C++."""
    gt = np.ascontiguousarray(gt, dtype=np.int32).ravel()
    pred = np.ascontiguousarray(pred, dtype=np.int32).ravel()
    assert gt.size == pred.size
    out = np.zeros((n_gt, n_pred), dtype=np.float64)
    if n_gt == 0 or n_pred == 0:
        return out
    lib = get_lib()
    if lib is not None:
        lib.pairwise_mask_iou(
            gt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            pred.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            gt.size, n_gt, n_pred,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out
    # numpy fallback via joint histogram
    valid = (gt >= 0) & (pred >= 0)
    joint = gt[valid].astype(np.int64) * n_pred + pred[valid]
    inter = np.bincount(joint, minlength=n_gt * n_pred).reshape(n_gt, n_pred)
    ga = np.bincount(gt[gt >= 0], minlength=n_gt)[:, None]
    pa = np.bincount(pred[pred >= 0], minlength=n_pred)[None, :]
    union = ga + pa - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(union > 0, inter / union, 0.0)
    return out
