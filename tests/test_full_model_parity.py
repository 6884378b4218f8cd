"""FULL-MODEL converted-checkpoint logit parity (VERDICT r1 #8).

Builds a live torch Mask2Former replica with mmdet's exact module tree
(state_dict keys match a real mmdet checkpoint: reference config
configs/mask2former/mask2former_r50_lsj_8x2_50e_coco-panoptic_custom.py and
the video head models/mask2former_vps/mask2former_video_head.py), runs its
forward with mmdet/mmcv semantics (MSDA encoder, masked-attention decoder,
cumsum sine PE), converts the state_dict with convert_mmdet_mask2former, and
asserts CLASS and MASK LOGIT parity of the flax model (encoder='msda') for
both the image (T=1) and video (T=2) paths.
"""
import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from openpvsg_tpu.config import (BackboneConfig, Mask2FormerConfig,
                                 PixelDecoderConfig, TransformerDecoderConfig)
from openpvsg_tpu.models.mask2former import Mask2Former
from openpvsg_tpu.train.checkpoint import (convert_mmdet_mask2former,
                                           torch_state_dict_to_numpy)

from test_msda_module import torch_msda_forward

C = 256          # feat channels (mmdet fixed)
HEADS = 8
Q = 8
NUM_CLASSES = 5  # 3 thing + 2 stuff
ENC_LAYERS = 1
DEC_LAYERS = 3
FFN = 256
N_POINTS = 4


# --------------------------------------------------------------- torch model
class TorchBottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = nn.Sequential(
            nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
            nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        idn = self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idn)


class TorchBackbone(nn.Module):
    """depth-26 mmdet ResNet (pytorch style), frozen BN."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        in_ch = 64
        for s, planes in enumerate((64, 128, 256, 512), start=1):
            stride = 1 if s == 1 else 2
            setattr(self, f"layer{s}",
                    nn.Sequential(TorchBottleneck(in_ch, planes, stride)))
            in_ch = planes * 4

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        outs = []
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
            outs.append(x)
        return outs


class ConvModule(nn.Module):
    def __init__(self, in_ch, out_ch, k):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, padding=k // 2)
        self.gn = nn.GroupNorm(32, out_ch)

    def forward(self, x, act=False):
        x = self.gn(self.conv(x))
        return F.relu(x) if act else x


class TorchMSDA(nn.Module):
    def __init__(self):
        super().__init__()
        self.sampling_offsets = nn.Linear(C, HEADS * 3 * N_POINTS * 2)
        self.attention_weights = nn.Linear(C, HEADS * 3 * N_POINTS)
        self.value_proj = nn.Linear(C, C)
        self.output_proj = nn.Linear(C, C)

    def forward(self, query, value, refs, shapes):
        w = {
            "value_proj_w": self.value_proj.weight,
            "value_proj_b": self.value_proj.bias,
            "sampling_offsets_w": self.sampling_offsets.weight,
            "sampling_offsets_b": self.sampling_offsets.bias,
            "attention_weights_w": self.attention_weights.weight,
            "attention_weights_b": self.attention_weights.bias,
            "output_proj_w": self.output_proj.weight,
            "output_proj_b": self.output_proj.bias,
        }
        return torch_msda_forward(w, query, value, refs, shapes,
                                  HEADS, 3, N_POINTS)


class FFNModule(nn.Module):
    """mmcv FFN key layout: layers.0.0 (Linear) + layers.1 (Linear)."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Sequential(nn.Linear(dim, hidden), nn.ReLU()),
            nn.Linear(hidden, dim))

    def forward(self, x):
        return x + self.layers(x)


class EncLayer(nn.Module):
    def __init__(self):
        super().__init__()
        self.attentions = nn.ModuleList([TorchMSDA()])
        self.ffns = nn.ModuleList([FFNModule(C, FFN)])
        self.norms = nn.ModuleList([nn.LayerNorm(C), nn.LayerNorm(C)])

    def forward(self, x, pos, refs, shapes):
        x = self.norms[0](x + self.attentions[0](x + pos, x, refs, shapes))
        return self.norms[1](self.ffns[0](x))


class TorchPixelDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.input_convs = nn.ModuleList(
            [ConvModule(ch, C, 1) for ch in (2048, 1024, 512)])
        self.level_encoding = nn.Embedding(3, C)
        self.encoder = nn.Module()
        self.encoder.layers = nn.ModuleList(
            [EncLayer() for _ in range(ENC_LAYERS)])
        self.lateral_convs = nn.ModuleList([ConvModule(256, C, 1)])
        self.output_convs = nn.ModuleList([ConvModule(C, C, 3)])
        self.mask_feature = nn.Conv2d(C, C, 1)

    def forward(self, feats):
        projs, shapes, srcs, poss = [], [], [], []
        for i in range(3):
            p = self.input_convs[i](feats[3 - i])
            b, _, h, w = p.shape
            projs.append(p)
            shapes.append((h, w))
            srcs.append(p.flatten(2).transpose(1, 2))
            pe = torch.from_numpy(np_pe_2d(h, w)).float()
            poss.append(pe.reshape(1, h * w, C)
                        + self.level_encoding.weight[i])
        src = torch.cat(srcs, 1)
        pos = torch.cat(poss, 1)
        refs = []
        for (h, w) in shapes:
            ys = (torch.arange(h).float() + 0.5) / h
            xs = (torch.arange(w).float() + 0.5) / w
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            refs.append(torch.stack([gx, gy], -1).reshape(h * w, 2))
        refs = torch.cat(refs, 0)[None].expand(src.shape[0], -1, -1)

        x = src
        for layer in self.encoder.layers:
            x = layer(x, pos, refs, shapes)
        outs, start = [], 0
        for (h, w) in shapes:
            outs.append(x[:, start:start + h * w].transpose(1, 2)
                        .reshape(-1, C, h, w))
            start += h * w
        y = self.lateral_convs[0](feats[0]) + F.interpolate(
            outs[-1], size=feats[0].shape[-2:], mode="bilinear",
            align_corners=False)
        y = self.output_convs[0](y, act=True)
        return self.mask_feature(y), outs


class AttnWrap(nn.Module):
    def __init__(self):
        super().__init__()
        self.attn = nn.MultiheadAttention(C, HEADS, batch_first=True)


class DecLayer(nn.Module):
    def __init__(self):
        super().__init__()
        self.attentions = nn.ModuleList([AttnWrap(), AttnWrap()])
        self.ffns = nn.ModuleList([FFNModule(C, FFN)])
        self.norms = nn.ModuleList([nn.LayerNorm(C) for _ in range(3)])

    def forward(self, query, query_pos, feat, feat_pos, blocked):
        # cross-attn (blocked: (B*H, Q, S) bool, True = may NOT attend)
        x = self.attentions[0].attn(query + query_pos, feat + feat_pos, feat,
                                    attn_mask=blocked)[0]
        query = self.norms[0](query + x)
        x = self.attentions[1].attn(query + query_pos, query + query_pos,
                                    query)[0]
        query = self.norms[1](query + x)
        return self.norms[2](self.ffns[0](query))


class TorchPanopticHead(nn.Module):
    def __init__(self):
        super().__init__()
        self.pixel_decoder = TorchPixelDecoder()
        self.query_embed = nn.Embedding(Q, C)
        self.query_feat = nn.Embedding(Q, C)
        self.level_embed = nn.Embedding(3, C)
        self.transformer_decoder = nn.Module()
        self.transformer_decoder.layers = nn.ModuleList(
            [DecLayer() for _ in range(DEC_LAYERS)])
        self.transformer_decoder.post_norm = nn.LayerNorm(C)
        self.cls_embed = nn.Linear(C, NUM_CLASSES + 1)
        self.mask_embed = nn.Sequential(nn.Linear(C, C), nn.ReLU(),
                                        nn.Linear(C, C), nn.ReLU(),
                                        nn.Linear(C, C))


class TorchMask2Former(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchBackbone()
        self.panoptic_head = TorchPanopticHead()


# ----------------------------------------------------- positional encodings
def _interleave(embed, num_feats, temperature=10000.0):
    dim_t = np.arange(num_feats, dtype=np.float32)
    dim_t = temperature ** (2.0 * np.floor(dim_t / 2.0) / num_feats)
    pos = embed[..., None] / dim_t
    out = np.empty((*embed.shape, num_feats), np.float32)
    out[..., 0::2] = np.sin(pos[..., 0::2])
    out[..., 1::2] = np.cos(pos[..., 1::2])
    return out


def np_pe_2d(h, w, num_feats=C // 2):
    """mmdet SinePositionalEncoding (normalize=True) via the reference's
    cumsum-of-valid-mask formulation."""
    ones = np.ones((h, w), np.float32)
    y = ones.cumsum(0)
    x = ones.cumsum(1)
    scale = 2 * math.pi
    y = y / (y[-1:, :] + 1e-6) * scale
    x = x / (x[:, -1:] + 1e-6) * scale
    return np.concatenate(
        [_interleave(y, num_feats), _interleave(x, num_feats)], -1)


def np_pe_3d(t, h, w, num_feats=C // 2):
    """Reference SinePositionalEncoding3D (position_encoding.py:55-99):
    2-D PE + a z-embedding spanning all channels."""
    pos2d = np_pe_2d(h, w, num_feats)
    z = np.ones((t,), np.float32).cumsum(0)
    z = z / (z[-1] + 1e-6) * (2 * math.pi)
    pos_z = _interleave(z, 2 * num_feats)
    return pos2d[None] + pos_z[:, None, None, :]


# ------------------------------------------------------------ torch forward
def torch_forward(model: TorchMask2Former, images: torch.Tensor):
    """images: (B, T, 3, H, W). mmdet semantics: backbone over B*T frames,
    video tokens = T*h*w, attn masks from interpolated mask logits."""
    B, T = images.shape[:2]
    feats = model.backbone(images.flatten(0, 1))
    head = model.panoptic_head
    mask_features, ms = head.pixel_decoder(feats)
    _, Cc, H4, W4 = mask_features.shape
    mask_features = mask_features.reshape(B, T, Cc, H4, W4)

    inputs, poss, hws = [], [], []
    for i, f in enumerate(ms):
        _, _, h, w = f.shape
        x = f.reshape(B, T, C, h, w).permute(0, 1, 3, 4, 2)
        x = x.reshape(B, T * h * w, C) + head.level_embed.weight[i]
        if T == 1:
            pe = torch.from_numpy(np_pe_2d(h, w)).float().reshape(1, h * w, C)
        else:
            pe = torch.from_numpy(np_pe_3d(T, h, w)).float().reshape(
                1, T * h * w, C)
        inputs.append(x)
        poss.append(pe)
        hws.append((h, w))

    query = head.query_feat.weight[None].expand(B, -1, -1)
    qpos = head.query_embed.weight[None].expand(B, -1, -1)

    def forward_head(q, hw):
        out = head.transformer_decoder.post_norm(q)
        cls_p = head.cls_embed(out)
        membed = head.mask_embed(out)
        mask_p = torch.einsum("bqc,btchw->bqthw", membed, mask_features)
        h, w = hw
        am = F.interpolate(mask_p.flatten(0, 1), size=(h, w),
                           mode="bilinear", align_corners=False)
        am = am.reshape(B, Q, T * h * w)
        blocked = am.sigmoid() < 0.5
        # mmdet rule: a fully-blocked query attends everywhere
        blocked[blocked.sum(-1) == blocked.shape[-1]] = False
        blocked = blocked[:, None].expand(B, HEADS, Q, T * h * w) \
            .reshape(B * HEADS, Q, T * h * w)
        return cls_p, mask_p, blocked

    cls_list, mask_list = [], []
    cls_p, mask_p, blocked = forward_head(query, hws[0])
    cls_list.append(cls_p)
    mask_list.append(mask_p)
    for i, layer in enumerate(head.transformer_decoder.layers):
        lvl = i % 3
        query = layer(query, qpos, inputs[lvl], poss[lvl], blocked)
        cls_p, mask_p, blocked = forward_head(query, hws[(i + 1) % 3])
        cls_list.append(cls_p)
        mask_list.append(mask_p)
    return torch.stack(cls_list), torch.stack(mask_list)


# -------------------------------------------------------------------- tests
def _flax_cfg():
    return Mask2FormerConfig(
        num_things_classes=3, num_stuff_classes=2, num_queries=Q,
        backbone=BackboneConfig(depth=26),
        pixel_decoder=PixelDecoderConfig(encoder_layers=ENC_LAYERS,
                                         ffn_channels=FFN, encoder="msda"),
        decoder=TransformerDecoderConfig(num_layers=DEC_LAYERS,
                                         ffn_channels=FFN))


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = TorchMask2Former()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn_like(mod.running_mean) * 0.2)
                mod.running_var.copy_(torch.rand_like(mod.running_var) + 0.5)
    return m.eval()


@pytest.mark.parametrize("T", [1, 2])
def test_full_model_logit_parity(torch_model, T, rng):
    imgs = rng.standard_normal((1, T, 32, 32, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        cls_t, mask_t = torch_forward(
            torch_model,
            torch.from_numpy(imgs.transpose(0, 1, 4, 2, 3).copy()))

    converted = convert_mmdet_mask2former(
        torch_state_dict_to_numpy(torch_model.state_dict()))
    variables = {"params": jax.tree.map(jnp.asarray, converted["params"]),
                 "batch_stats": jax.tree.map(jnp.asarray,
                                             converted["batch_stats"])}
    cfg = _flax_cfg()
    model = Mask2Former(cfg, train=True)  # all-layer masks like the oracle
    out = model.apply(variables, jnp.asarray(imgs))

    cls_ours = np.asarray(out["cls_preds"])          # (L+1, B, Q, K+1)
    mask_ours = np.asarray(out["mask_preds"])        # (L+1, B, Q, T, H4, W4)
    np.testing.assert_allclose(cls_ours, cls_t.numpy(), atol=2e-3,
                               err_msg="class logits diverge")
    np.testing.assert_allclose(mask_ours, mask_t.numpy(), atol=2e-3,
                               err_msg="mask logits diverge")


def test_relation_pth_bundle_predict_parity(tmp_path, rng):
    """The .pth relation-bundle load path of tools/rel_test.py:17-26: save a
    torch-format bundle, load via load_relation_params, and assert span/pred
    parity of the temporal-transformer predict path against the reference
    semantics (reference: models/relation_head/transformer.py:35-57)."""
    from openpvsg_tpu.models.relation.heads import RelationModel

    feature_dim = 64
    torch.manual_seed(1)

    sub = nn.Module()
    sub.transformer_encoder = nn.TransformerEncoder(
        nn.TransformerEncoderLayer(feature_dim, 4, 128, dropout=0.0), 2)
    obj = nn.Module()
    obj.transformer_encoder = nn.TransformerEncoder(
        nn.TransformerEncoderLayer(feature_dim, 4, 128, dropout=0.0), 2)
    pair = nn.Module()
    pair.pair_ffn = nn.Sequential(nn.Linear(feature_dim * 2, 32), nn.ReLU(),
                                  nn.Linear(32, 1))
    rel = nn.Module()
    rel.transformer_encoder = nn.TransformerEncoder(
        nn.TransformerEncoderLayer(2 * feature_dim, 4, 512, dropout=0.0), 1)
    rel.layer_norm = nn.LayerNorm(2 * feature_dim)
    rel.fc1 = nn.Linear(2 * feature_dim, feature_dim)
    rel.fc2 = nn.Linear(feature_dim, feature_dim // 2)
    rel.span_head = nn.Linear(feature_dim // 2, 7)
    rel.pred_head = nn.Linear(feature_dim // 2, 7)

    bundle = {"subject_encoder": sub.state_dict(),
              "object_encoder": obj.state_dict(),
              "pair_proposal_model": pair.state_dict(),
              "relation_model": rel.state_dict()}
    path = str(tmp_path / "bundle.pth")
    torch.save(bundle, path)

    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.rel_test import load_relation_params
    params = load_relation_params(path, "transformer")

    P, T = 3, 6
    pair_feats = rng.standard_normal((P, T, 2 * feature_dim)) \
        .astype(np.float32)

    # torch oracle of TemporalTransformer.forward (transformer.py:35-57):
    # (P, T, D) -> seq-first, +PE over time, encoder, LN, heads, max over T
    x = torch.from_numpy(pair_feats).transpose(0, 1)  # (T, P, D)
    pos = torch.arange(T).unsqueeze(1).float()
    div = torch.exp(torch.arange(0, 2 * feature_dim, 2).float()
                    * (-math.log(10000.0) / (2 * feature_dim)))
    pe = torch.zeros(T, 1, 2 * feature_dim)
    pe[:, 0, 0::2] = torch.sin(pos * div)
    pe[:, 0, 1::2] = torch.cos(pos * div)
    with torch.no_grad():
        y = rel.transformer_encoder((x + pe))
        y = rel.layer_norm(y).transpose(0, 1)
        y = F.relu(rel.fc1(y))
        y = F.relu(rel.fc2(y))
        span_t = rel.span_head(y).numpy()
        pred_t = rel.pred_head(y).max(dim=1).values.numpy()

    model = RelationModel(model_name="transformer", feature_dim=feature_dim,
                          num_relations=7)
    span, prob = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                             jnp.asarray(pair_feats),
                             method=RelationModel.predict)
    np.testing.assert_allclose(np.asarray(span), span_t, atol=2e-4)
    np.testing.assert_allclose(np.asarray(prob), pred_t, atol=2e-4)
