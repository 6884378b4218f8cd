"""RLE codec tests: roundtrip, pycocotools bit-compatibility vectors, and
native-vs-python agreement."""
import numpy as np
import pytest

from openpvsg_tpu import native
from openpvsg_tpu.data import rle


def random_mask(rng, h=37, w=23, blobby=True):
    if blobby:
        base = rng.random((h // 4 + 1, w // 4 + 1)) > 0.5
        mask = np.kron(base, np.ones((4, 4), dtype=bool))[:h, :w]
    else:
        mask = rng.random((h, w)) > 0.5
    return mask.astype(np.uint8)


def test_counts_roundtrip(rng):
    for _ in range(20):
        m = random_mask(rng)
        counts = rle.mask_to_counts(m)
        back = rle.counts_to_mask(counts, *m.shape)
        np.testing.assert_array_equal(m, back)


def test_string_roundtrip(rng):
    for blobby in (True, False):
        for _ in range(10):
            m = random_mask(rng, blobby=blobby)
            enc = rle.encode(m)
            assert isinstance(enc["counts"], str)
            dec = rle.decode(enc)
            np.testing.assert_array_equal(m, dec)


def test_python_fallback_matches_native(rng):
    if not native.have_native():
        pytest.skip("native lib unavailable")
    for _ in range(10):
        m = random_mask(rng)
        counts = rle.mask_to_counts(m)
        py_str = rle._counts_to_string_py(counts)
        nat = rle.encode(m)
        assert nat["counts"] == py_str
        np.testing.assert_array_equal(rle._string_to_counts_py(py_str), counts)


def test_pycocotools_golden_vectors():
    """Hand-verified vectors of the COCO counts-string format.

    A 3x3 mask, column-major runs: mask[:,0]=[0,1,1], mask[:,1]=[1,0,0],
    mask[:,2]=[0,0,1] -> flat F-order [0,1,1,1,0,0,0,0,1] -> counts [1,3,4,1].
    LEB: 1->'1', 3->'3', 4->'4', then count[3]-count[1]=1-3=-2 -> negative
    delta encoding.
    """
    mask = np.array([[0, 1, 0],
                     [1, 0, 0],
                     [1, 0, 1]], dtype=np.uint8)
    counts = rle.mask_to_counts(mask)
    np.testing.assert_array_equal(counts, [1, 3, 4, 1])
    enc = rle.encode(mask)
    assert enc["size"] == (3, 3)
    dec = rle.decode(enc)
    np.testing.assert_array_equal(dec, mask)
    # negative-delta encoding roundtrip
    np.testing.assert_array_equal(rle._string_to_counts_py(enc["counts"]), counts)


def test_all_zero_and_all_one():
    z = np.zeros((5, 4), dtype=np.uint8)
    o = np.ones((5, 4), dtype=np.uint8)
    for m in (z, o):
        enc = rle.encode(m)
        np.testing.assert_array_equal(rle.decode(enc), m)
    assert rle.area(rle.encode(z)) == 0
    assert rle.area(rle.encode(o)) == 20


def test_area_and_iou(rng):
    for _ in range(5):
        a = random_mask(rng)
        b = random_mask(rng)
        ea, eb = rle.encode(a), rle.encode(b)
        assert rle.area(ea) == int(a.sum())
        inter = np.logical_and(a, b).sum()
        union = np.logical_or(a, b).sum()
        expect = inter / union if union else 0.0
        assert rle.iou(ea, eb) == pytest.approx(expect, abs=1e-12)


def test_hand_derived_counts_strings():
    """Literals derived by hand from the COCO LEB128 spec (5-bit groups,
    continuation 0x20, chars offset 48, delta vs counts[i-2] for i>2) —
    pins the wire format independently of both implementations."""
    # all-ones 10x10: counts [0, 100]; 0 -> '0'; 100 = 0b1100100:
    # group1 = 4 (+cont) -> 'T', group2 = 3 -> '3'
    ones = np.ones((10, 10), np.uint8)
    assert rle.encode(ones)["counts"] == "0T3"
    # single fg pixel at flat position 5 of a 4x3 mask (F-order):
    # counts [5, 1, 6] -> '5', '1', '6'
    m = np.zeros((4, 3), np.uint8)
    m[1, 1] = 1  # F-order index = 1 + 1*4 = 5
    assert rle.encode(m)["counts"] == "516"
    # negative delta: counts [1, 3, 4, 1]: raw '1','3','4', then
    # 1 - 3 = -2 -> 5-bit two's complement 0b11110 = 30 -> chr(78) = 'N'
    m2 = np.array([[0, 1, 0], [1, 0, 0], [1, 0, 1]], np.uint8)
    assert rle.encode(m2)["counts"] == "134N"


def test_large_runs():
    """Runs longer than 2^15 exercise multi-char LEB continuation."""
    m = np.zeros((1000, 100), dtype=np.uint8)
    m[:, 40:] = 1
    enc = rle.encode(m)
    np.testing.assert_array_equal(rle.decode(enc), m)
    assert rle.area(enc) == 60 * 1000
