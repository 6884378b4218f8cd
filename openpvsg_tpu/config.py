"""Typed configuration for the OpenPVSG-TPU framework.

Replaces the reference's mmcv python-dict config sprawl (reference:
configs/*.py with _base_ inheritance) with small dataclasses plus named
presets. CLI tools accept ``--set key=value`` dotted overrides, covering the
reference's ``--cfg-options`` capability.
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

from openpvsg_tpu import NUM_CLASSES, NUM_RELATIONS, NUM_STUFF_CLASSES, NUM_THING_CLASSES


@dataclass(frozen=True)
class BackboneConfig:
    kind: str = "resnet"  # 'resnet' | 'swin'
    depth: int = 50
    swin_variant: str = "tiny"  # tiny | small | base
    # norm: 'frozen_bn' (IPS: BN requires_grad=False + norm_eval), 'sync_bn'
    # (VPS: stats pmean'd over the data mesh axis), or 'gn'.
    norm: str = "frozen_bn"
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    dtype: str = "float32"  # compute dtype; params always float32


@dataclass(frozen=True)
class PixelDecoderConfig:
    """MSDeformAttn pixel decoder (reference config:
    configs/mask2former/..._custom.py:35-67)."""
    in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    strides: Tuple[int, ...] = (4, 8, 16, 32)
    feat_channels: int = 256
    out_channels: int = 256
    num_outs: int = 3
    encoder_layers: int = 6
    # 'axial' = dense TPU-first encoder (default, MXU-bound);
    # 'msda'  = exact multi-scale deformable attention (gather-bound; use
    #           when running converted reference checkpoints)
    encoder: str = "axial"
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    ffn_channels: int = 1024
    num_groups: int = 32  # GN groups
    # serve the stride-4 FPN chain (lateral+GN+3x3+GN+mask_feature) as the
    # fused Pallas kernel (ops/pallas/fpn_kernel.py) — inference-only (no
    # VJP). Default OFF everywhere: in-model A/B measured it NET NEGATIVE
    # (PERF.md r3); opt in here or via SegmenterInference(fused_fpn=True).
    fused_fpn: bool = False


@dataclass(frozen=True)
class TransformerDecoderConfig:
    """Masked-attention DETR decoder (reference config lines 72-96)."""
    num_layers: int = 9
    num_heads: int = 8
    feat_channels: int = 256
    ffn_channels: int = 2048


@dataclass(frozen=True)
class Mask2FormerConfig:
    num_things_classes: int = NUM_THING_CLASSES
    num_stuff_classes: int = NUM_STUFF_CLASSES
    num_queries: int = 100
    num_transformer_feat_level: int = 3
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    pixel_decoder: PixelDecoderConfig = field(default_factory=PixelDecoderConfig)
    decoder: TransformerDecoderConfig = field(default_factory=TransformerDecoderConfig)
    # video (VPS) options
    video: bool = False
    num_frames: int = 2
    # loss weights (reference lines 97-117)
    loss_cls_weight: float = 2.0
    loss_mask_weight: float = 5.0
    loss_dice_weight: float = 5.0
    bg_cls_weight: float = 0.1
    # mask-loss evaluation mode: 'dense' computes BCE/dice/assignment costs
    # over every stride-4 pixel as batched matmuls (exact objective,
    # MXU-bound — the TPU-first default); 'points' reproduces the
    # reference's point-rend sampling (train_cfg, lines 120-123), which is
    # gather-bound on TPU.
    loss_sampling: str = "dense"
    # target assignment: 'hungarian' (exact, host LAP via callback),
    # 'lapjv' (exact, fully on-device Jonker-Volgenant — no callback),
    # 'greedy' (on-device approximation), or 'auto' (hungarian where host
    # callbacks work, lapjv on TPU where XLA rejects callbacks — e.g. axon)
    assigner: str = "auto"
    # spatial average-pool factor applied to BOTH mask operands of the
    # MATCHING cost only (losses stay full-res; dense mode only). The
    # assignment is a discrete argmin over per-pair mean costs, stable under
    # 2-4x pooling, and the cost matrices are the bandwidth-bound part of
    # the train step (PERF.md r4 MFU) — 1 = exact reference semantics.
    # MEASURED (r5, benchmarks/r5): quality-neutral at the rich-cascade
    # operating point (ds=2: PQ 0.5127/VPQ 0.3140 vs baseline 0.5136/0.3169,
    # within the ±0.08 per-video spread) AND speed-neutral post
    # layer-batching (79.67 vs 79.78 ms) — measured-and-shelved, keep 1.
    match_downsample: int = 1
    # dense-mode mask-loss layout: 'query' materializes GT copies at all Q
    # query slots (reference-shaped; unmatched rows are zero-weighted);
    # 'target' inverts the assignment and gathers the <=N matched pred rows
    # instead — exact same summands, less loss-side VALUE traffic at Q=100,
    # N<=40 (train/losses.py dense_mask_losses_target_layout). MEASURED
    # (r5, benchmarks/r5/mfu_*tlayout*): NET NEGATIVE in f32 (81.5 vs 79.8
    # ms N=20; 91.5 vs 89.2 N=40) and a wash under bf16 logits — the
    # take_along_axis gather/scatter-transpose costs more HBM than the
    # zero-weighted rows it avoids (XLA fuses those multiplies into the
    # producing einsum). Kept opt-in as a documented negative result.
    loss_layout: str = "query"
    # dtype of the per-layer full-res mask LOGITS (and, in the trainer, of
    # the binary GT masks — exact for 0/1 values). 'float32' = reference
    # semantics; 'bfloat16' halves the single largest train-step HBM tensor
    # (the (L, B, Q, T, H/4, W/4) deep-supervision logits + its gradient)
    # — einsum accumulation stays f32 (preferred_element_type) and every
    # loss reduction accumulates f32 (train/losses.py), so only the HBM
    # round-trip is bf16. MEASURED (r5): 75.1 vs 79.8 ms N=20 / 86.0 vs
    # 89.2 ms N=40 (benchmarks/r5/mfu_*_bf16.json) but quality-NEGATIVE on
    # the rich-cascade parity run — PQ 0.424 vs 0.514 on identical
    # data+seed (benchmarks/r5/bf16_quality.json), the loss landing on the
    # thing branch. Stays opt-in; default float32.
    mask_logits_dtype: str = "float32"
    # serving-only: store backbone + pixel-decoder kernels int8 in HBM with
    # per-output-channel scales, dequantized inside the jitted forward
    # (utils/quantize.py — weights-only; PERF.md r5 records the measured
    # f/s + PQ deltas). Ignored by training.
    int8_weights: bool = False
    num_points: int = 12544
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    # fusion / test cfg (lines 135-147)
    object_mask_thr: float = 0.8
    iou_thr: float = 0.8
    max_per_image: int = 100
    filter_low_score: bool = True
    # split thing/stuff query supervision (head variant, SURVEY §2.3:
    # Mask2FormerHeadSplitFocal / Mask2FormerVideoHeadSplit — the last
    # num_stuff_classes queries supervise stuff, the rest things)
    split_thing_stuff: bool = False
    # focal classification loss (head variant: Mask2FormerHeadFocal)
    focal_cls: bool = False
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    # per-pixel semantic aux head (VPS option: loss_sem_seg,
    # mask2former_video_head.py:145-149,509-519)
    with_sem_seg: bool = False
    sem_seg_weight: float = 1.0

    @property
    def num_classes(self) -> int:
        return self.num_things_classes + self.num_stuff_classes


@dataclass(frozen=True)
class TrackerConfig:
    """UniTrack MOTS association parameters (reference:
    configs/unitrack/imagenet_resnet50_s3_womotion_timecycle.py:5-41)."""
    conf_thres: float = 0.5
    track_buffer: int = 300
    use_kalman: bool = True
    asso_with_motion: bool = False
    motion_lambda: float = 0.98
    motion_gated: bool = False
    dup_iou_thres: float = 0.15
    confirm_iou_thres: float = 0.7
    max_mask_area: int = 300
    feat_size: Tuple[int, int] = (4, 10)
    first_assoc_thresh: float = 0.9  # appearance association cost limit
    second_assoc_iou_thresh: float = 0.5
    prop_flag: bool = False
    down_factor: int = 8
    appearance_depth: int = 50  # ResNet depth of the appearance model
    # appearance-encoder zoo entry + layer surgery (reference model_type /
    # remove_layers, models/unitrack/model/model.py:89-147; see tracker/zoo.py)
    model_type: str = "imagenet50"
    remove_layers: Tuple[str, ...] = ("layer4",)


@dataclass(frozen=True)
class RelationHeadConfig:
    """Relation-head hyperparameters (reference: tools/rel_train.py:38-97)."""
    model_name: str = "transformer"  # vanilla | filter | conv | transformer
    d_model: int = 256
    # capacity knobs, plumbed through RelationModel.from_config; defaults =
    # the reference's fixed values (base.py:29-37 encoder d256/h8/ff512/L2,
    # transformer.py:19-26 temporal h4/ff512/L1, convolution.py:43 k5)
    encoder_layers: int = 2
    encoder_heads: int = 8
    encoder_ffn: int = 512
    temporal_layers: int = 1
    temporal_heads: int = 4
    temporal_ffn: int = 512
    num_relations: int = NUM_RELATIONS
    num_top_pairs: int = 100
    max_tubes: int = 100
    max_frames: int = 900
    conv_kernel: int = 5
    # beyond-reference: feed [s, o, s-o, s*o] (not just [s, o]) to the
    # temporal model — see RelationModel.pair_interaction for rationale
    pair_interaction: bool = False
    # training
    lr: float = 1e-4
    epochs: int = 100
    accumulation_steps: int = 32
    loss_prob_weight: float = 5.0


@dataclass(frozen=True)
class TrainConfig:
    """Segmenter optimization (reference config lines 163-191 + schedules)."""
    lr: float = 1e-4
    weight_decay: float = 0.05
    backbone_lr_mult: float = 0.1
    embed_no_decay: bool = True
    grad_clip: float = 0.01
    epochs: int = 8
    lr_step_epochs: Tuple[int, ...] = (7,)
    lr_gamma: float = 0.1
    warmup_iters: int = 10
    warmup_ratio: float = 1e-3
    samples_per_gpu: int = 32
    seed: int = 0
    checkpoint_interval: int = 1
    log_interval: int = 50


@dataclass(frozen=True)
class DataConfig:
    data_dir: str = "./data"
    anno_file: str = "./data/pvsg.json"
    work_dir: str = "./work_dirs"
    # train pipeline (reference: configs/_base_/datasets/pvsg_vps.py:4-22)
    train_scale: Tuple[int, int] = (360, 480)  # (h, w), keep_ratio=False
    crop_size: Tuple[int, int] = (360, 480)
    flip_prob: float = 0.5
    pad_divisor: int = 32
    # normalization: BGR order with to_rgb=False quirk (SURVEY §2.1)
    mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    std: Tuple[float, float, float] = (58.395, 57.12, 57.375)
    to_rgb: bool = False
    ref_seq_index: Tuple[int, ...] = (0, 1)  # 2-frame VPS clips
    ref_seq_len_test: int = 2
    num_workers: int = 4


@dataclass(frozen=True)
class PVSGConfig:
    """Top-level experiment config."""
    name: str = "mask2former_ips"
    model: Mask2FormerConfig = field(default_factory=Mask2FormerConfig)
    tracker: TrackerConfig = field(default_factory=TrackerConfig)
    relation: RelationHeadConfig = field(default_factory=RelationHeadConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)


# ---------------------------------------------------------------------------
# Presets mirroring the reference configs/ tree
# ---------------------------------------------------------------------------

def mask2former_ips() -> PVSGConfig:
    """configs/mask2former/mask2former_r50_lsj_8x2_50e_coco-panoptic_custom.py"""
    return PVSGConfig(name="mask2former_ips")


def mask2former_vps() -> PVSGConfig:
    """configs/mask2former_vps/mask2former_video_r50.py (2-frame clips,
    SyncBN backbone, 3-D positional encoding)."""
    return PVSGConfig(
        name="mask2former_vps",
        model=Mask2FormerConfig(
            video=True,
            num_frames=2,
            backbone=BackboneConfig(norm="sync_bn"),
        ),
        train=dataclasses.replace(TrainConfig(), samples_per_gpu=16),
    )


def relation_head(model_name: str = "transformer") -> PVSGConfig:
    return PVSGConfig(
        name=f"relation_{model_name}",
        relation=RelationHeadConfig(model_name=model_name),
    )


def relation_conv_interact() -> PVSGConfig:
    """The capacity study's winning cell (capacity_study.json / DEMO.md):
    temporal-conv head with the pair-interaction input ([s, o, s-o, s*o])
    and doubled capacity — the only configuration that substantially
    learns geometry-derived predicates (val R@20 11.8 -> 20.5 on oracle
    tubes). Beyond-reference; the four `relation_*` presets above remain
    reference-exact."""
    return PVSGConfig(
        name="relation_conv_interact",
        relation=RelationHeadConfig(
            model_name="conv", pair_interaction=True,
            encoder_layers=3, encoder_ffn=1024,
            temporal_layers=2, temporal_heads=8, temporal_ffn=1024,
        ),
    )


def relation_conv_large() -> PVSGConfig:
    """The data-rich twin of ``relation_conv_interact``: same tripled
    conv-head capacity, WITHOUT the pair-interaction input. The round-5
    oracle-tube data-scaling study (benchmarks/r5/oracle_scaling.json,
    DEMO.md) shows pair_interaction is a small-data prior — it wins at
    24-48 training videos, but at 96 videos plain conv/large overtakes
    it (val R@20 27.4 vs 24.8) with half the parameters. Prefer this
    preset when per-predicate training data is plentiful."""
    return PVSGConfig(
        name="relation_conv_large",
        relation=RelationHeadConfig(
            model_name="conv",
            encoder_layers=3, encoder_ffn=1024,
            temporal_layers=2, temporal_heads=8, temporal_ffn=1024,
        ),
    )


def mask2former_swin(video: bool = True) -> PVSGConfig:
    """Swin-T backbone variant of the VPS segmenter."""
    return PVSGConfig(
        name="mask2former_swin_vps" if video else "mask2former_swin_ips",
        model=Mask2FormerConfig(
            video=video,
            num_frames=2 if video else 1,
            backbone=BackboneConfig(kind="swin", swin_variant="tiny"),
            pixel_decoder=PixelDecoderConfig(in_channels=(96, 192, 384, 768)),
        ),
    )


PRESETS = {
    "mask2former_ips": mask2former_ips,
    "mask2former_vps": mask2former_vps,
    "mask2former_swin_ips": lambda: mask2former_swin(False),
    "mask2former_swin_vps": lambda: mask2former_swin(True),
    "relation_vanilla": lambda: relation_head("vanilla"),
    "relation_filter": lambda: relation_head("filter"),
    "relation_conv": lambda: relation_head("conv"),
    "relation_transformer": lambda: relation_head("transformer"),
    "relation_conv_interact": relation_conv_interact,
    "relation_conv_large": relation_conv_large,
}


def get_config(name: str) -> PVSGConfig:
    """Preset name, or a path to a config.json dumped by save_config
    (tools/train.py writes one into the work dir — the reference dumps its
    resolved mmcv config the same way, tools/train.py:198)."""
    if name.endswith(".json"):
        if not os.path.exists(name):
            raise FileNotFoundError(
                f"config file '{name}' does not exist (a .json --config is "
                f"always treated as a path, never a preset name)")
        return load_config_file(name)
    if name not in PRESETS:
        raise KeyError(f"unknown config preset '{name}'; have {sorted(PRESETS)}")
    return PRESETS[name]()


def config_to_dict(cfg: PVSGConfig) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def _dataclass_from_dict(cls, d: Dict[str, Any]):
    defaults = cls()
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        cur = getattr(defaults, f.name)
        if isinstance(v, dict) and dataclasses.is_dataclass(cur):
            kwargs[f.name] = _dataclass_from_dict(type(cur), v)
        elif isinstance(v, list):
            # json has no tuples; every sequence field here is a tuple
            kwargs[f.name] = tuple(tuple(e) if isinstance(e, list) else e
                                   for e in v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def save_config(cfg: PVSGConfig, path: str) -> None:
    import json

    with open(path, "w") as f:
        json.dump(config_to_dict(cfg), f, indent=1)


def load_config_file(path: str) -> PVSGConfig:
    import json

    with open(path) as f:
        d = json.load(f)
    return _dataclass_from_dict(PVSGConfig, d)


def apply_overrides(cfg: Any, overrides: Dict[str, Any]) -> Any:
    """Apply dotted-path overrides (the --cfg-options equivalent)."""
    for key, value in overrides.items():
        parts = key.split(".")
        cfg = _replace_path(cfg, parts, value)
    return cfg


def _replace_path(obj: Any, parts: List[str], value: Any) -> Any:
    if len(parts) == 1:
        cur = getattr(obj, parts[0])
        if cur is not None and not isinstance(value, type(cur)):
            if isinstance(cur, bool):
                value = str(value).lower() in ("1", "true", "yes")
            elif isinstance(cur, (int, float)):
                value = type(cur)(value)
            elif isinstance(cur, tuple):
                value = tuple(type(cur[0])(v)
                  for v in str(value).strip("()[] ").split(","))
        return dataclasses.replace(obj, **{parts[0]: value})
    child = getattr(obj, parts[0])
    return dataclasses.replace(obj, **{parts[0]: _replace_path(child, parts[1:], value)})


def parse_set_args(pairs: Sequence[str]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        out[k] = v
    return out
