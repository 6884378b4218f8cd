"""Weights-only int8 serving (utils/quantize.py + SegmenterInference)."""
import jax
import jax.numpy as jnp
import numpy as np

from openpvsg_tpu.utils.quantize import (Q8_KEY, SCALE_KEY, dequantize_tree,
                                         quantize_tree_int8)


def test_quantize_roundtrip_bound(rng):
    w = rng.standard_normal((16, 32, 8, 256)).astype(np.float32)
    tree = {"params": {"backbone": {"conv": {"kernel": jnp.asarray(w),
                                             "bias": jnp.zeros(256)}}}}
    q, n, saved = quantize_tree_int8(tree, scopes=("backbone",))
    assert n == 1 and saved == w.size * 3  # f32 -> int8 saves 3 bytes/elem
    leaf = q["params"]["backbone"]["conv"]["kernel"]
    assert leaf[Q8_KEY].dtype == jnp.int8
    # bias untouched
    assert q["params"]["backbone"]["conv"]["bias"].dtype == jnp.float32
    d = dequantize_tree(q, jnp.float32)
    err = np.abs(np.asarray(d["params"]["backbone"]["conv"]["kernel"]) - w)
    # per-out-channel symmetric: |err| <= scale/2 = max|w_ch| / 254
    bound = np.abs(w).max(axis=(0, 1, 2)) / 254.0 + 1e-7
    assert (err <= bound[None, None, None, :]).all()


def test_quantize_scoping_and_min_size():
    tree = {"params": {
        "backbone": {"big": {"kernel": jnp.ones((128, 64))},
                     "small": {"kernel": jnp.ones((4, 4))}},
        "head": {"big": {"kernel": jnp.ones((128, 64))}},
    }}
    q, n, _ = quantize_tree_int8(tree, scopes=("backbone",), min_elems=1024)
    assert n == 1  # small (under min_elems) and head (out of scope) skipped
    assert Q8_KEY in q["params"]["backbone"]["big"]["kernel"]
    assert SCALE_KEY in q["params"]["backbone"]["big"]["kernel"]
    assert isinstance(q["params"]["head"]["big"]["kernel"], jnp.ndarray)


def test_dequantize_scale_mul_exact_one():
    w = np.linspace(-3, 3, 32 * 64, dtype=np.float32).reshape(32, 64)
    q, _, _ = quantize_tree_int8({"m": {"kernel": jnp.asarray(w)}},
                                 min_elems=1)
    base = dequantize_tree(q, jnp.float32)["m"]["kernel"]
    pert = dequantize_tree(q, jnp.float32,
                           scale_mul=jnp.float32(1.0))["m"]["kernel"]
    np.testing.assert_array_equal(np.asarray(base), np.asarray(pert))


def test_segmenter_inference_int8_close(rng):
    """The int8 forward must run end-to-end and track the fp32 forward:
    identical fusion segmentation on an easy input and small logit drift."""
    from openpvsg_tpu.config import mask2former_ips
    from openpvsg_tpu.infer.segmenter import SegmenterInference
    import dataclasses

    cfg = mask2former_ips().model
    cfg = dataclasses.replace(
        cfg, num_queries=8,
        pixel_decoder=dataclasses.replace(cfg.pixel_decoder,
                                          encoder_layers=1),
        decoder=dataclasses.replace(cfg.decoder, num_layers=1))
    from openpvsg_tpu.models.mask2former import Mask2Former

    model = Mask2Former(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 1, 64, 64, 3)))
    frames = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    fp = SegmenterInference(cfg, variables)
    q8 = SegmenterInference(cfg, variables, int8_weights=True)
    cls_fp, mask_fp, _ = fp.forward_frames(frames)
    cls_q8, mask_q8, _ = q8.forward_frames(frames)
    assert cls_q8.shape == cls_fp.shape and mask_q8.shape == mask_fp.shape
    # weights-only int8 drift stays small relative to the logit range
    scale = float(np.abs(np.asarray(cls_fp)).max()) + 1e-6
    drift = float(np.abs(np.asarray(cls_q8) - np.asarray(cls_fp)).max())
    assert drift / scale < 0.15, (drift, scale)
