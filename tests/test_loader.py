"""PrefetchLoader semantics: ordering, batch count, skip-None, fill."""
import numpy as np

from openpvsg_tpu.data.loader import PrefetchLoader


def test_loader_batches_and_order():
    def make(i):
        return {"x": np.full((2,), i)}

    def collate(samples):
        return np.stack([s["x"] for s in samples])

    loader = PrefetchLoader(make, list(range(10)), 3, collate,
                            num_workers=2, drop_last=True)
    batches = list(loader)
    assert len(batches) == len(loader) == 3
    seen = np.concatenate([b[:, 0] for b in batches])
    assert sorted(seen.tolist()) == list(range(9))


def test_loader_skips_none_and_fills():
    def make(i):
        return None if i % 2 else {"x": np.full((1,), i)}

    def collate(samples):
        return np.stack([s["x"] for s in samples])

    loader = PrefetchLoader(make, list(range(8)), 4, collate, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b.shape == (4, 1)  # None-samples replaced by repeats


def test_instance_postprocess(rng):
    from openpvsg_tpu.models.fusion import instance_postprocess

    Q, K, H, W = 6, 5, 8, 8
    cls_logits = rng.standard_normal((Q, K + 1)).astype(np.float32)
    cls_logits[0, 1] = 8.0  # thing class, high score
    mask_logits = rng.standard_normal((Q, H, W)).astype(np.float32)
    labels, scores, masks = instance_postprocess(
        cls_logits, mask_logits, num_things_classes=3, max_per_image=10)
    assert labels.shape == scores.shape
    assert masks.shape[1:] == (H, W)
    assert (labels < 3).all()           # things only
    assert (np.diff(scores) <= 1e-6).all()  # sorted desc
