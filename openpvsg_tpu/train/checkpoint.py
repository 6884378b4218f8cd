"""Checkpointing (orbax) + PyTorch-checkpoint converters.

Covers the reference's checkpoint surface (SURVEY.md §5):
- orbax save/restore of params / batch_stats / opt_state with step metadata
  (reference: mmcv checkpoint hook + --resume-from / --auto-resume)
- converters from the reference's .pth zoo into our flax trees so COCO
  warm-start and trained reference weights load directly:
    convert_mmdet_mask2former — mmdet Mask2FormerCustom state_dict
    convert_relation_bundle   — the 4-model relation bundle
      (reference: tools/rel_train.py:223-231)
    convert_torchvision_resnet — appearance model / backbone warm start

Conventions: torch convs are OIHW -> flax HWIO; torch Linear weight is
(out, in) -> flax Dense kernel (in, out); torch MultiheadAttention packs
q/k/v into in_proj_weight -> split into three Dense kernels.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# orbax
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state, step: int | None = None):
    import orbax.checkpoint as ocp
    import jax

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, jax.device_get(state), force=True)
    ckpt.wait_until_finished()


def load_checkpoint(path: str, target=None):
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(os.path.abspath(path), target)
    # Return HOST arrays: orbax restores jax arrays committed to device 0,
    # and a committed single-device TrainState fed to a mesh-jitted step
    # raises "incompatible devices" (fresh-init arrays are uncommitted, so
    # the same jit places them replicated). Host arrays keep placement the
    # consumer's jit's decision, matching fresh init on any mesh.
    return jax.tree.map(np.asarray, restored)


def check_no_extra_params(model, example, variables, where: str = "model"):
    """Fail loudly when `variables` contains param paths the model never
    reads. flax's apply silently IGNORES extra params (verified), so e.g.
    loading a 10-decoder-layer checkpoint into a 9-layer config runs a
    truncated model with no error. Missing params / shape mismatches
    already raise inside apply; only the extra case is silent. Structure
    comes from jax.eval_shape (no FLOPs)."""
    import flax
    import jax

    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), example))
    for coll in ("params", "batch_stats"):
        if coll not in variables or coll not in expected:
            continue
        got = set(flax.traverse_util.flatten_dict(dict(variables[coll])))
        want = set(flax.traverse_util.flatten_dict(dict(expected[coll])))
        extra = got - want
        if extra:
            sample = sorted("/".join(p) for p in extra)[:8]
            raise ValueError(
                f"{where}: checkpoint has {len(extra)} {coll} entries the "
                f"configured model does not use (flax would silently ignore "
                f"them — likely a config/checkpoint mismatch, e.g. fewer "
                f"layers configured than trained): {sample}")


# ---------------------------------------------------------------------------
# torch -> flax converters (work on plain {name: np.ndarray} dicts; call
# `torch_state_dict_to_numpy` first when starting from a .pth file)
# ---------------------------------------------------------------------------

def torch_state_dict_to_numpy(path_or_dict) -> Dict[str, np.ndarray]:
    if isinstance(path_or_dict, (str, os.PathLike)):
        import torch

        obj = torch.load(path_or_dict, map_location="cpu", weights_only=False)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    else:
        sd = path_or_dict
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _conv(w):  # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):  # (out, in) -> (in, out)
    return np.transpose(w)


class _TreeBuilder:
    def __init__(self):
        self.params: Dict = {}
        self.batch_stats: Dict = {}

    def put(self, tree: Dict, path: str, value: np.ndarray):
        parts = path.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = np.asarray(value)

    def conv(self, path, w, b=None):
        self.put(self.params, f"{path}/kernel", _conv(w))
        if b is not None:
            self.put(self.params, f"{path}/bias", b)

    def dense(self, path, w, b=None):
        self.put(self.params, f"{path}/kernel", _lin(w))
        if b is not None:
            self.put(self.params, f"{path}/bias", b)

    def bn(self, path, sd, prefix):
        # our Norm wrapper scopes the flax BatchNorm under ".../bn"
        self.put(self.params, f"{path}/bn/scale", sd[f"{prefix}.weight"])
        self.put(self.params, f"{path}/bn/bias", sd[f"{prefix}.bias"])
        self.put(self.batch_stats, f"{path}/bn/mean", sd[f"{prefix}.running_mean"])
        self.put(self.batch_stats, f"{path}/bn/var", sd[f"{prefix}.running_var"])

    def gn(self, path, sd, prefix):
        self.put(self.params, f"{path}/scale", sd[f"{prefix}.weight"])
        self.put(self.params, f"{path}/bias", sd[f"{prefix}.bias"])

    def norm(self, path, sd, prefix):
        self.put(self.params, f"{path}/scale", sd[f"{prefix}.weight"])
        self.put(self.params, f"{path}/bias", sd[f"{prefix}.bias"])

    def mha(self, path, sd, prefix):
        """torch nn.MultiheadAttention -> q/k/v/out Dense."""
        w = sd[f"{prefix}.in_proj_weight"]
        b = sd[f"{prefix}.in_proj_bias"]
        c = w.shape[1]
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            self.dense(f"{path}/{name}", w[i * c:(i + 1) * c], b[i * c:(i + 1) * c])
        self.dense(f"{path}/out_proj", sd[f"{prefix}.out_proj.weight"],
                   sd[f"{prefix}.out_proj.bias"])


def _convert_resnet_backbone(tb: _TreeBuilder, sd: Dict[str, np.ndarray],
                             src: str = "backbone", dst: str = "backbone"):
    tb.conv(f"{dst}/conv1", sd[f"{src}.conv1.weight"])
    tb.bn(f"{dst}/bn1", sd, f"{src}.bn1")
    stage = 1
    while f"{src}.layer{stage}.0.conv1.weight" in sd:
        b = 0
        while f"{src}.layer{stage}.{b}.conv1.weight" in sd:
            p = f"{src}.layer{stage}.{b}"
            d = f"{dst}/layer{stage}_{b}"
            c = 1
            while f"{p}.conv{c}.weight" in sd:  # 2 convs = BasicBlock, 3 = Bottleneck
                tb.conv(f"{d}/conv{c}", sd[f"{p}.conv{c}.weight"])
                tb.bn(f"{d}/bn{c}", sd, f"{p}.bn{c}")
                c += 1
            if f"{p}.downsample.0.weight" in sd:
                tb.conv(f"{d}/downsample_conv", sd[f"{p}.downsample.0.weight"])
                tb.bn(f"{d}/downsample_bn", sd, f"{p}.downsample.1")
            b += 1
        stage += 1


def convert_mmdet_mask2former(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """mmdet Mask2Former(Custom/Video) state_dict -> {'params', 'batch_stats'}
    matching openpvsg_tpu.models.mask2former.Mask2Former."""
    tb = _TreeBuilder()
    _convert_resnet_backbone(tb, sd)

    # ---- pixel decoder
    pd = "panoptic_head.pixel_decoder"
    i = 0
    while f"{pd}.input_convs.{i}.conv.weight" in sd:
        tb.conv(f"pixel_decoder/input_conv_{i}/conv",
                sd[f"{pd}.input_convs.{i}.conv.weight"],
                sd.get(f"{pd}.input_convs.{i}.conv.bias"))
        tb.gn(f"pixel_decoder/input_conv_{i}/gn", sd, f"{pd}.input_convs.{i}.gn")
        i += 1
    tb.put(tb.params, "pixel_decoder/level_embed", sd[f"{pd}.level_encoding.weight"])
    li = 0
    while f"{pd}.encoder.layers.{li}.attentions.0.sampling_offsets.weight" in sd:
        p = f"{pd}.encoder.layers.{li}"
        d = f"pixel_decoder/encoder_layer_{li}"
        a = f"{p}.attentions.0"
        for nm in ("sampling_offsets", "attention_weights", "value_proj", "output_proj"):
            tb.dense(f"{d}_attn/{nm}", sd[f"{a}.{nm}.weight"], sd[f"{a}.{nm}.bias"])
        tb.dense(f"{d}_ffn/fc1", sd[f"{p}.ffns.0.layers.0.0.weight"],
                 sd[f"{p}.ffns.0.layers.0.0.bias"])
        tb.dense(f"{d}_ffn/fc2", sd[f"{p}.ffns.0.layers.1.weight"],
                 sd[f"{p}.ffns.0.layers.1.bias"])
        tb.norm(f"{d}_norm1", sd, f"{p}.norms.0")
        tb.norm(f"{d}_norm2", sd, f"{p}.norms.1")
        li += 1
    i = 0
    while f"{pd}.lateral_convs.{i}.conv.weight" in sd:
        tb.conv(f"pixel_decoder/lateral_conv_{i}/conv",
                sd[f"{pd}.lateral_convs.{i}.conv.weight"],
                sd.get(f"{pd}.lateral_convs.{i}.conv.bias"))
        tb.gn(f"pixel_decoder/lateral_conv_{i}/gn", sd, f"{pd}.lateral_convs.{i}.gn")
        tb.conv(f"pixel_decoder/output_conv_{i}/conv",
                sd[f"{pd}.output_convs.{i}.conv.weight"],
                sd.get(f"{pd}.output_convs.{i}.conv.bias"))
        tb.gn(f"pixel_decoder/output_conv_{i}/gn", sd, f"{pd}.output_convs.{i}.gn")
        i += 1
    tb.conv("pixel_decoder/mask_feature", sd[f"{pd}.mask_feature.weight"],
            sd[f"{pd}.mask_feature.bias"])

    # ---- transformer head
    h = "panoptic_head"
    tb.put(tb.params, "head/query_embed", sd[f"{h}.query_embed.weight"])
    tb.put(tb.params, "head/query_feat", sd[f"{h}.query_feat.weight"])
    tb.put(tb.params, "head/level_embed", sd[f"{h}.level_embed.weight"])
    li = 0
    while f"{h}.transformer_decoder.layers.{li}.attentions.0.attn.in_proj_weight" in sd:
        p = f"{h}.transformer_decoder.layers.{li}"
        d = f"head/layer_{li}"
        tb.mha(f"{d}/cross_attn", sd, f"{p}.attentions.0.attn")
        tb.mha(f"{d}/self_attn", sd, f"{p}.attentions.1.attn")
        tb.dense(f"{d}/ffn/fc1", sd[f"{p}.ffns.0.layers.0.0.weight"],
                 sd[f"{p}.ffns.0.layers.0.0.bias"])
        tb.dense(f"{d}/ffn/fc2", sd[f"{p}.ffns.0.layers.1.weight"],
                 sd[f"{p}.ffns.0.layers.1.bias"])
        tb.norm(f"{d}/norm1", sd, f"{p}.norms.0")
        tb.norm(f"{d}/norm2", sd, f"{p}.norms.1")
        tb.norm(f"{d}/norm3", sd, f"{p}.norms.2")
        li += 1
    tb.norm("head/decoder_norm", sd, f"{h}.transformer_decoder.post_norm")
    tb.dense("head/cls_embed", sd[f"{h}.cls_embed.weight"], sd[f"{h}.cls_embed.bias"])
    for j, fc in enumerate((0, 2, 4)):
        tb.dense(f"head/mask_embed/fc{j}",
                 sd[f"{h}.mask_embed.layers.{fc // 2}.weight"]
                 if f"{h}.mask_embed.layers.{fc // 2}.weight" in sd
                 else sd[f"{h}.mask_embed.{fc}.weight"],
                 sd[f"{h}.mask_embed.layers.{fc // 2}.bias"]
                 if f"{h}.mask_embed.layers.{fc // 2}.bias" in sd
                 else sd[f"{h}.mask_embed.{fc}.bias"])
    return {"params": tb.params, "batch_stats": tb.batch_stats}


def convert_mmdet_swin(sd: Dict[str, np.ndarray],
                       src: str = "backbone") -> Dict[str, Any]:
    """mmdet SwinTransformer state_dict -> flax SwinTransformer tree
    (mmdet layout: patch_embed.projection, stages.S.blocks.B.{norm1,
    attn.w_msa.*, norm2, ffn.layers.0.0/.1}, stages.S.downsample.*,
    out norms norm0..norm3)."""
    tb = _TreeBuilder()
    tb.conv("patch_embed", sd[f"{src}.patch_embed.projection.weight"],
            sd[f"{src}.patch_embed.projection.bias"])
    tb.norm("patch_norm", sd, f"{src}.patch_embed.norm")
    s = 0
    while f"{src}.stages.{s}.blocks.0.norm1.weight" in sd:
        b = 0
        while f"{src}.stages.{s}.blocks.{b}.norm1.weight" in sd:
            p = f"{src}.stages.{s}.blocks.{b}"
            d = f"stage{s}_block{b}"
            tb.norm(f"{d}/norm1", sd, f"{p}.norm1")
            tb.norm(f"{d}/norm2", sd, f"{p}.norm2")
            a = f"{p}.attn.w_msa"
            tb.dense(f"{d}/attn/qkv", sd[f"{a}.qkv.weight"], sd[f"{a}.qkv.bias"])
            tb.dense(f"{d}/attn/proj", sd[f"{a}.proj.weight"], sd[f"{a}.proj.bias"])
            tb.put(tb.params, f"{d}/attn/rel_bias_table",
                   sd[f"{a}.relative_position_bias_table"])
            tb.dense(f"{d}/mlp_fc1", sd[f"{p}.ffn.layers.0.0.weight"],
                     sd[f"{p}.ffn.layers.0.0.bias"])
            tb.dense(f"{d}/mlp_fc2", sd[f"{p}.ffn.layers.1.weight"],
                     sd[f"{p}.ffn.layers.1.bias"])
            b += 1
        if f"{src}.stages.{s}.downsample.norm.weight" in sd:
            tb.norm(f"downsample{s}/norm", sd, f"{src}.stages.{s}.downsample.norm")
            tb.dense(f"downsample{s}/reduction",
                     sd[f"{src}.stages.{s}.downsample.reduction.weight"])
        s += 1
    for i in range(4):
        if f"{src}.norm{i}.weight" in sd:
            tb.norm(f"out_norm{i}", sd, f"{src}.norm{i}")
    return {"params": tb.params}


def convert_torchvision_resnet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision resnet50 state_dict (no prefix) -> flax ResNet tree."""
    sd = {f"backbone.{k}": v for k, v in sd.items()}
    tb = _TreeBuilder()
    _convert_resnet_backbone(tb, sd, src="backbone", dst="")
    # drop the leading empty key level
    params = tb.params.get("", tb.params)
    stats = tb.batch_stats.get("", tb.batch_stats)
    return {"params": params, "batch_stats": stats}


def convert_unitrack_checkpoint(raw: Dict[str, np.ndarray],
                                model_type: str) -> Dict[str, Any]:
    """Checkpoint surgery for the UniTrack appearance zoo (reference:
    models/unitrack/model/model.py:40-147): per-entry key renames onto a
    plain torchvision-style resnet state_dict, then the standard conversion.
    Keys that do not map (projection heads etc.) are dropped — the
    reference's partial_load semantics.
    """
    sd: Dict[str, np.ndarray] = {}
    for k, v in raw.items():
        nk = None
        if model_type == "crw":
            k2 = k
            if "conv1.1.weight" in k2 or "conv2.1.weight" in k2:
                k2 = k2.replace(".1.weight", ".weight")
            nk = k2.replace("encoder.model.", "") if "encoder.model" in k2 else k2
            if "head" in nk:
                nk = None
        elif model_type == "uvc":
            if "gray_encoder" in k:
                nk = k.replace("module.gray_encoder.", "")
        elif model_type == "timecycle":
            if "encoderVideo" in k:
                nk = k.replace("module.encoderVideo.", "")
                v = np.asarray(v)
                if v.ndim == 5:  # inflated 3-D conv -> squeeze the T tap
                    v = v.squeeze(2)
        elif model_type in ("mocov2", "moco-v1", "moco-v2"):
            if "module.encoder_q" in k:
                nk = k.replace("module.encoder_q.", "")
        elif model_type in ("byol", "vince"):
            if "feature_extractor" in k:
                nk = k.replace("feature_extractor.module.model.", "")
        else:  # ssl bundles / plain torchvision: keys already bare
            nk = k
        if nk is not None and not nk.startswith(("fc.", "head")):
            sd[nk] = v
    return convert_torchvision_resnet(sd)


def _convert_torch_encoder_layer(tb: _TreeBuilder, sd, src: str, dst: str):
    tb.mha(f"{dst}/self_attn", sd, f"{src}.self_attn")
    tb.dense(f"{dst}/linear1", sd[f"{src}.linear1.weight"], sd[f"{src}.linear1.bias"])
    tb.dense(f"{dst}/linear2", sd[f"{src}.linear2.weight"], sd[f"{src}.linear2.bias"])
    tb.norm(f"{dst}/norm1", sd, f"{src}.norm1")
    tb.norm(f"{dst}/norm2", sd, f"{src}.norm2")


def convert_relation_bundle(bundle: Dict[str, Dict[str, np.ndarray]],
                            model_name: str = "transformer") -> Dict[str, Any]:
    """The reference's 4-model relation bundle -> RelationModel params."""
    tb = _TreeBuilder()
    for which in ("subject_encoder", "object_encoder"):
        sd = bundle[which]
        i = 0
        while f"transformer_encoder.layers.{i}.self_attn.in_proj_weight" in sd:
            _convert_torch_encoder_layer(
                tb, sd, f"transformer_encoder.layers.{i}", f"{which}/layer_{i}")
            i += 1
    pp = bundle["pair_proposal_model"]
    tb.put(tb.params, "pair_proposal/fc1_kernel", _lin(pp["pair_ffn.0.weight"]))
    tb.put(tb.params, "pair_proposal/fc1_bias", pp["pair_ffn.0.bias"])
    tb.dense("pair_proposal/fc2", pp["pair_ffn.2.weight"], pp["pair_ffn.2.bias"])

    rm = bundle["relation_model"]
    if model_name == "transformer":
        i = 0
        while f"transformer_encoder.layers.{i}.self_attn.in_proj_weight" in rm:
            _convert_torch_encoder_layer(
                tb, rm, f"transformer_encoder.layers.{i}", f"temporal/layer_{i}")
            i += 1
        tb.norm("temporal/final_norm", rm, "layer_norm")
    elif model_name == "conv":
        i = 0
        while f"conv_layers.{i * 2}.weight" in rm:
            w = rm[f"conv_layers.{i * 2}.weight"]  # (out, in, k)
            tb.put(tb.params, f"temporal/conv_{i}/kernel", np.transpose(w, (2, 1, 0)))
            tb.put(tb.params, f"temporal/conv_{i}/bias", rm[f"conv_layers.{i * 2}.bias"])
            i += 1
    for head in ("fc1", "fc2", "span_head", "pred_head"):
        tb.dense(f"temporal/heads/{head}", rm[f"{head}.weight"], rm[f"{head}.bias"])
    return {"params": tb.params}
