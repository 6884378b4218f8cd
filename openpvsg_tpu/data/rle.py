"""COCO-compatible RLE mask codec.

The reference pipeline writes mask tubes as `masks.txt` lines
`frame id cid imh imw rle` where `rle` is the ascii `counts` string produced
by pycocotools (reference: models/unitrack/utils/io.py:14-36, decode at
utils/relation_matching.py:76-79). The codec here is bit-identical to
pycocotools' rleToString/rleFrString so outputs interoperate with the
reference tooling.

Fast path = the in-repo C++ library (openpvsg_tpu.native); fallback = numpy.
Masks are encoded in Fortran (column-major) order, runs alternate 0s/1s
starting with a zero-run.
"""
from __future__ import annotations

import ctypes
from typing import Dict, Union

import numpy as np

from openpvsg_tpu import native

RLE = Dict[str, Union[str, tuple]]


# ---------------------------------------------------------------------------
# Pure-numpy reference implementation (also the fallback)
# ---------------------------------------------------------------------------

def mask_to_counts(mask: np.ndarray) -> np.ndarray:
    """Binary HxW mask -> raw run counts (uint32), column-major scan."""
    flat = np.asfortranarray(mask.astype(np.uint8) > 0).ravel(order="F")
    if flat.size == 0:
        return np.zeros(1, dtype=np.uint32)
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(bounds).astype(np.uint32)
    if flat[0]:  # runs must start with a zero-run
        counts = np.concatenate([[0], counts]).astype(np.uint32)
    return counts


def counts_to_mask(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    """Raw run counts -> binary HxW uint8 mask."""
    counts = np.asarray(counts, dtype=np.int64)
    n = int(counts.sum())
    vals = np.zeros(len(counts), dtype=np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    if n < h * w:
        flat = np.concatenate([flat, np.zeros(h * w - n, dtype=np.uint8)])
    return flat[: h * w].reshape(h, w, order="F")


def _counts_to_string_py(counts: np.ndarray) -> str:
    out = []
    counts = np.asarray(counts, dtype=np.int64)
    m = len(counts)
    for i in range(m):
        x = int(counts[i])
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def _string_to_counts_py(s: str) -> np.ndarray:
    counts = []
    p = 0
    n = len(s)
    while p < n:
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[p]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return np.asarray(counts, dtype=np.uint32)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def encode(mask: np.ndarray) -> RLE:
    """Encode a binary HxW mask into {'size': (h, w), 'counts': str}."""
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = mask.shape
    lib = native.get_lib()
    if lib is not None:
        fmask = np.asfortranarray(mask).ravel(order="F")
        buf = ctypes.create_string_buffer(8 * (h * w + 2) // 1 + 16)
        n = lib.rle_encode_to_string(
            fmask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, buf)
        return {"size": (h, w), "counts": buf.raw[:n].decode("ascii")}
    return {"size": (h, w), "counts": _counts_to_string_py(mask_to_counts(mask))}


def decode(rle: RLE) -> np.ndarray:
    """Decode {'size': (h, w), 'counts': str} into a binary HxW uint8 mask."""
    h, w = int(rle["size"][0]), int(rle["size"][1])
    counts = rle["counts"]
    if isinstance(counts, bytes):
        counts = counts.decode("ascii")
    lib = native.get_lib()
    if lib is not None and isinstance(counts, str):
        out = np.zeros(h * w, dtype=np.uint8)
        lib.rle_decode_from_string(
            counts.encode("ascii"), h, w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.reshape(h, w, order="F")
    if isinstance(counts, str):
        counts = _string_to_counts_py(counts)
    return counts_to_mask(np.asarray(counts), h, w)


def area(rle: RLE) -> int:
    """Foreground pixel count straight from the counts string."""
    counts = rle["counts"]
    if isinstance(counts, str):
        lib = native.get_lib()
        if lib is not None:
            return int(lib.rle_area_from_string(counts.encode("ascii")))
        counts = _string_to_counts_py(counts)
    return int(np.asarray(counts, dtype=np.int64)[1::2].sum())


def iou(rle_a: RLE, rle_b: RLE) -> float:
    """IoU of two RLEs without densifying (run-merge in C++ when available)."""
    ca, cb = rle_a["counts"], rle_b["counts"]
    if isinstance(ca, str) and isinstance(cb, str):
        lib = native.get_lib()
        if lib is not None:
            return float(lib.rle_iou_from_strings(ca.encode("ascii"), cb.encode("ascii")))
    a = decode(rle_a).astype(bool)
    b = decode(rle_b).astype(bool)
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter / union) if union > 0 else 0.0
