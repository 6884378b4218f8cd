"""ResNet backbone (flax.linen, NHWC).

TPU-native rebuild of the torchvision/mmdet ResNet-50 used by both segmenters
(reference: configs/mask2former/..._custom.py:15-24 — depth 50, pytorch style,
BN frozen for IPS / SyncBN for VPS) and by the UniTrack appearance model
(reference: models/unitrack/model/resnet.py, cut at layer3).

Layout is NHWC (TPU conv-friendly); the weight converter transposes torch
OIHW kernels at load time. "pytorch style" = stride lives on the 3x3 conv of
each bottleneck.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# 26 = one bottleneck per stage (test/debug scale)
STAGE_BLOCKS = {18: (2, 2, 2, 2), 26: (1, 1, 1, 1), 34: (3, 4, 6, 3),
                50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}
# depths built from BasicBlock (2 convs, expansion 1) instead of Bottleneck
BASIC_DEPTHS = (18, 34)


class Norm(nn.Module):
    """Normalization dispatcher: frozen_bn | sync_bn | gn | folded.

    frozen_bn always uses running stats (reference IPS backbone:
    norm_eval=True + requires_grad=False). sync_bn computes batch stats and
    cross-replica averages them over `axis_name` when training (reference VPS
    backbone: SyncBN). 'folded' is the inference-serving mode: the BN affine
    has been folded into the preceding conv by fold_frozen_bn(), so this is
    the identity (and the conv carries a bias).
    """
    kind: str = "frozen_bn"
    train: bool = False
    axis_name: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.kind == "folded":
            return x
        if self.kind == "gn":
            return nn.GroupNorm(num_groups=32, dtype=self.dtype, name="gn")(x)
        use_running = (self.kind == "frozen_bn") or (not self.train)
        return nn.BatchNorm(
            use_running_average=use_running,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name if (self.kind == "sync_bn" and self.train) else None,
            dtype=self.dtype,
            name="bn",
        )(x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    norm: str = "frozen_bn"
    train: bool = False
    axis_name: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=self.norm == "folded", dtype=self.dtype, name="conv1")(x)
        out = Norm(self.norm, self.train, self.axis_name, self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=self.norm == "folded", dtype=self.dtype,
                      name="conv2")(out)
        out = Norm(self.norm, self.train, self.axis_name, self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=self.norm == "folded", dtype=self.dtype, name="conv3")(out)
        out = Norm(self.norm, self.train, self.axis_name, self.dtype, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=self.norm == "folded", dtype=self.dtype, name="downsample_conv")(x)
            identity = Norm(self.norm, self.train, self.axis_name, self.dtype,
                            name="downsample_bn")(identity)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    """torchvision BasicBlock (resnet18/34): two 3x3 convs, expansion 1 —
    the UniTrack appearance zoo's resnet18 entries (crw/uvc/imagenet18,
    reference: models/unitrack/model/resnet.py)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    norm: str = "frozen_bn"
    train: bool = False
    axis_name: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=self.norm == "folded",
                      dtype=self.dtype, name="conv1")(x)
        out = Norm(self.norm, self.train, self.axis_name, self.dtype,
                   name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=self.norm == "folded", dtype=self.dtype, name="conv2")(out)
        out = Norm(self.norm, self.train, self.axis_name, self.dtype,
                   name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=self.norm == "folded", dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = Norm(self.norm, self.train, self.axis_name, self.dtype,
                            name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Returns the requested stage outputs (strides 4/8/16/32, channels
    256/512/1024/2048 for depth 50; 64/128/256/512 for the BasicBlock
    depths 18/34)."""
    depth: int = 50
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    norm: str = "frozen_bn"
    train: bool = False
    axis_name: str | None = None
    dtype: Any = jnp.float32
    num_stages: int = 4
    # per-stage first-block stride; UniTrack's "s3" appearance model uses
    # (1, 2, 2) with 3 stages for a stride-8 layer3 output
    stage_strides: Tuple[int, ...] = (1, 2, 2, 2)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        blocks = STAGE_BLOCKS[self.depth][: self.num_stages]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=self.norm == "folded", dtype=self.dtype, name="conv1")(x)
        x = Norm(self.norm, self.train, self.axis_name, self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = 64
        block_cls = BasicBlock if self.depth in BASIC_DEPTHS else Bottleneck
        for stage, n_blocks in enumerate(blocks):
            stride = self.stage_strides[stage]
            for b in range(n_blocks):
                # BasicBlock stage 1 needs no downsample (64 -> 64, stride 1)
                down = (b == 0) and not (block_cls is BasicBlock
                                         and stage == 0 and stride == 1)
                x = block_cls(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    downsample=down,
                    norm=self.norm,
                    train=self.train,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return outs


def _bn_key_for(conv_key: str) -> str | None:
    if conv_key == "downsample_conv":
        return "downsample_bn"
    if conv_key.startswith("conv"):
        return "bn" + conv_key[len("conv"):]
    return None


def fold_frozen_bn(variables, eps: float = 1e-5):
    """Fold inference-mode BatchNorm affines into the preceding convs.

    Serving-graph optimization: y = BN(conv(x)) with running stats is
    conv(x)*s + b with s = gamma/sqrt(var+eps), b = beta - mean*s, which is
    exactly a conv with kernel*s and bias b. Removes every BN op (and its
    rsqrt/convert chain) from the backbone HLO — this model is op-count
    bound on TPU (PERF.md), so fewer ops is the win. Returns new variables
    for the same model built with backbone norm='folded'
    (config: replace(cfg.backbone, norm='folded')); batch_stats are
    consumed. Exact in f32 (up to one float reassociation per channel).

    The reference has no analogue (torch runs eval-mode BN as a separate
    cudnn op; mmcv's fuse_conv_bn tool exists but is never invoked —
    reference tools/ has no call site).
    """
    import jax
    import numpy as np

    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    stats = jax.tree_util.tree_map(np.asarray,
                                   dict(variables.get("batch_stats", {})))

    def fold(p, s):
        out = {}
        consumed = set()
        for k, v in p.items():
            bnk = _bn_key_for(k) if isinstance(v, dict) else None
            if (bnk is not None and "kernel" in v and bnk in p
                    and isinstance(s, dict) and bnk in s):
                bn, st = p[bnk]["bn"], s[bnk]["bn"]
                scale = bn["scale"] / np.sqrt(st["var"] + eps)
                out[k] = {"kernel": v["kernel"] * scale,
                          "bias": bn["bias"] - st["mean"] * scale}
                consumed.add(bnk)
            elif isinstance(v, dict):
                out[k] = fold(v, s.get(k, {}) if isinstance(s, dict) else {})
            else:
                out[k] = v
        for k in consumed:
            out.pop(k, None)
        return out

    new_params = fold(params, stats)
    new_vars = {k: v for k, v in variables.items()
                if k not in ("params", "batch_stats")}
    # commit leaves to device: numpy leaves in a jitted function's inputs
    # are re-transferred on EVERY call (measured: ~3 s/call through the
    # axon tunnel for the R-50 tree — worse than the op savings by 400x)
    new_vars["params"] = jax.tree_util.tree_map(jnp.asarray, new_params)
    return new_vars
