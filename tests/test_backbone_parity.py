"""Backbone + positional-encoding numerics for the converted-checkpoint
path: a frozen-BN ResNet bottleneck must match a torch replica through the
converter, and the sine PEs must match the reference's cumsum formulation."""
import math

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from openpvsg_tpu.models.position_encoding import (sine_pos_encoding,
                                                   sine_pos_encoding_3d)
from openpvsg_tpu.models.resnet import Bottleneck
from openpvsg_tpu.train.checkpoint import _TreeBuilder, torch_state_dict_to_numpy


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
        self.relu = nn.ReLU()

    def forward(self, x):
        idn = self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idn)


def test_bottleneck_frozen_bn_matches_torch(rng):
    inplanes, planes, stride = 16, 8, 2
    t = TorchBottleneck(inplanes, planes, stride)
    # non-trivial running stats
    with torch.no_grad():
        for bn in (t.bn1, t.bn2, t.bn3, t.downsample[1]):
            bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.2)
            bn.running_var.copy_(torch.rand_like(bn.running_var) + 0.5)
            bn.weight.copy_(torch.randn_like(bn.weight) * 0.3 + 1)
            bn.bias.copy_(torch.randn_like(bn.bias) * 0.1)
    t.eval()
    x = torch.randn(2, inplanes, 12, 12)
    with torch.no_grad():
        expect = t(x).permute(0, 2, 3, 1).numpy()

    sd = torch_state_dict_to_numpy(
        {f"backbone.layer1.0.{k}": v for k, v in t.state_dict().items()})
    tb = _TreeBuilder()
    p = "backbone.layer1.0"
    for c in (1, 2, 3):
        tb.conv(f"conv{c}", sd[f"{p}.conv{c}.weight"])
        tb.bn(f"bn{c}", sd, f"{p}.bn{c}")
    tb.conv("downsample_conv", sd[f"{p}.downsample.0.weight"])
    tb.bn("downsample_bn", sd, f"{p}.downsample.1")

    model = Bottleneck(planes=planes, stride=stride, downsample=True,
                       norm="frozen_bn")
    variables = {"params": jax.tree.map(jnp.asarray, tb.params),
                 "batch_stats": jax.tree.map(jnp.asarray, tb.batch_stats)}
    ours = model.apply(variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(ours), expect, atol=2e-4)


def _reference_sine_pe(h, w, num_feats=8, temperature=10000.0,
                       scale=2 * math.pi, eps=1e-6):
    """mmdet SinePositionalEncoding via explicit cumsum (all-valid mask)."""
    not_mask = np.ones((h, w))
    y = not_mask.cumsum(0)
    x = not_mask.cumsum(1)
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = temperature ** (2 * (np.arange(num_feats) // 2) / num_feats)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    def interleave(p):
        return np.stack([np.sin(p[..., 0::2]), np.cos(p[..., 1::2])],
                        axis=-1).reshape(h, w, num_feats)
    return np.concatenate([interleave(pos_y), interleave(pos_x)], axis=-1)


def test_sine_pe_matches_reference_cumsum():
    h, w, f = 5, 7, 8
    ours = np.asarray(sine_pos_encoding(h, w, num_feats=f))
    expect = _reference_sine_pe(h, w, num_feats=f)
    np.testing.assert_allclose(ours, expect, atol=1e-5)


def test_sine_pe_3d_matches_reference():
    """3-D PE = 2-D concat(pos_y, pos_x) + z interleaved over 2*num_feats
    (reference: position_encoding.py:74-103)."""
    t, h, w, f = 3, 4, 5, 8
    ours = np.asarray(sine_pos_encoding_3d(t, h, w, num_feats=f))
    pe2d = _reference_sine_pe(h, w, num_feats=f)
    z = (np.arange(1, t + 1) / (t + 1e-6)) * 2 * math.pi
    dim_tz = 10000.0 ** (2 * (np.arange(2 * f) // 2) / (2 * f))
    pos_z = z[:, None] / dim_tz
    pz = np.stack([np.sin(pos_z[:, 0::2]), np.cos(pos_z[:, 1::2])],
                  axis=-1).reshape(t, 2 * f)
    expect = pe2d[None] + pz[:, None, None, :]
    np.testing.assert_allclose(ours, expect, atol=1e-5)
