"""Palette-mask decoding + panoptic id convention tests."""
import numpy as np

from openpvsg_tpu import EVAL_DIVISOR, INSTANCE_OFFSET
from openpvsg_tpu.data.masks import (
    decode_palette_mask, masks_to_boxes, pan_hb2mm, pan_mm2hb)


def test_decode_palette_mask_basic():
    # objects: object_id 1 = "cat" (class 3), object_id 2 = "floor" (class 7)
    pan = np.array([[0, 1, 1],
                    [2, 2, 1],
                    [0, 2, 2]], dtype=np.int64)
    objects = [{"object_id": 1, "category": "cat"},
               {"object_id": 2, "category": "floor"}]
    cidx = {"cat": 3, "floor": 7}
    out = decode_palette_mask(pan, objects, cidx, num_classes=10)

    expect_sem = np.array([[10, 3, 3], [7, 7, 3], [10, 7, 7]])
    np.testing.assert_array_equal(out["gt_semantic_seg"], expect_sem)
    np.testing.assert_array_equal(
        out["gt_panoptic_seg"], expect_sem.astype(np.int64) * EVAL_DIVISOR + pan)
    np.testing.assert_array_equal(out["gt_labels"], [3, 7])
    np.testing.assert_array_equal(out["gt_instance_ids"], [1, 2])
    assert out["gt_masks"].shape == (2, 3, 3)
    # mask union == non-background area (reference assertion loading.py:159-161)
    np.testing.assert_array_equal(out["gt_masks"].sum(0), (pan != 0).astype(np.uint8))


def test_masks_to_boxes():
    masks = np.zeros((2, 5, 6), dtype=np.uint8)
    masks[0, 1:3, 2:5] = 1
    boxes = masks_to_boxes(masks)
    np.testing.assert_array_equal(boxes[0], [2, 1, 4, 2])
    np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])  # empty mask


def test_pan_mm2hb_roundtrip():
    num_classes = 126
    mm = np.array([5, num_classes, 7 + 3 * INSTANCE_OFFSET, 125 + 9 * INSTANCE_OFFSET])
    hb = pan_mm2hb(mm, num_classes)
    np.testing.assert_array_equal(
        hb, [5 * EVAL_DIVISOR, num_classes * EVAL_DIVISOR,
             7 * EVAL_DIVISOR + 3, 125 * EVAL_DIVISOR + 9])
    np.testing.assert_array_equal(pan_hb2mm(hb), mm)
