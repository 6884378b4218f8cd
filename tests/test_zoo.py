"""Appearance-encoder zoo: registry coverage, remove_layers semantics, and
checkpoint-surgery numerics vs a torch resnet18 oracle (reference:
models/unitrack/model/model.py make_encoder + resnet.modify)."""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from openpvsg_tpu.tracker.zoo import make_encoder
from openpvsg_tpu.train.checkpoint import convert_unitrack_checkpoint


@pytest.mark.parametrize("model_type,channels", [
    ("imagenet18", 256), ("imagenet50", 1024), ("crw", 256),
    ("mocov2", 1024), ("byol", 1024),
])
def test_zoo_entries_build_and_run(model_type, channels, rng):
    model, down = make_encoder(model_type)
    assert down == 8
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out[0].shape == (1, 4, 4, channels)  # stride 8, layer3 channels


def test_zoo_random_encoder(rng):
    model, down = make_encoder("random", random_dim=16)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    out = model.apply({}, x)
    assert out[0].shape == (1, 4, 4, 16)
    # deterministic per input, different across inputs
    out2 = model.apply({}, x)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out2[0]))
    out3 = model.apply({}, x + 1.0)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out3[0]))


def test_zoo_rejects_unknown_and_hrnet():
    with pytest.raises(NotImplementedError):
        make_encoder("hrnet_w18")
    with pytest.raises(ValueError):
        make_encoder("resnext9000")


# ------------------------------------------------------- surgery numerics
class TorchBasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride, downsample):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idn)


class TorchResNet18S3(nn.Module):
    """resnet18 with UniTrack modify(remove_layers=['layer4']): stages 1-3,
    layer3 stride forced to 1."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.layer1 = nn.Sequential(TorchBasicBlock(64, 64, 1, False),
                                    TorchBasicBlock(64, 64, 1, False))
        self.layer2 = nn.Sequential(TorchBasicBlock(64, 128, 2, True),
                                    TorchBasicBlock(128, 128, 1, False))
        self.layer3 = nn.Sequential(TorchBasicBlock(128, 256, 1, True),
                                    TorchBasicBlock(256, 256, 1, False))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, stride=2, padding=1)
        return self.layer3(self.layer2(self.layer1(x)))


def test_crw_surgery_matches_torch(rng):
    torch.manual_seed(3)
    t = TorchResNet18S3()
    with torch.no_grad():
        for m in t.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.2)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    t.eval()
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        expect = t(x).permute(0, 2, 3, 1).numpy()

    # crw checkpoints prefix keys with encoder.model. and carry a head
    raw = {f"encoder.model.{k}": v.numpy()
           for k, v in t.state_dict().items()}
    raw["head.fc.weight"] = np.zeros((4, 4), np.float32)
    converted = convert_unitrack_checkpoint(raw, "crw")

    model, down = make_encoder("crw")
    variables = {"params": jax.tree.map(jnp.asarray, converted["params"]),
                 "batch_stats": jax.tree.map(jnp.asarray,
                                             converted["batch_stats"])}
    out = model.apply(variables, jnp.asarray(
        x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(out[0]), expect, atol=1e-4)


def test_tracker_and_tool_agree_on_appearance_spec(rng):
    """Regression: the stage-2 tool initialized appearance weights with
    tracker_cfg's model_type/remove_layers while the tracker's jitted
    extractor rebuilt the encoder with hardcoded defaults — any
    non-default value crashed (ScopeParamNotFoundError) or was silently
    ignored. Both now resolve through resolve_appearance_spec."""
    import jax
    import jax.numpy as jnp

    from openpvsg_tpu.config import TrackerConfig
    from openpvsg_tpu.tracker.appearance import (make_appearance_model,
                                                 resolve_appearance_spec)
    from openpvsg_tpu.tracker.tracker import MaskAssociationTracker

    frame = rng.integers(0, 255, (64, 64, 3)).astype(np.float32)
    masks = np.zeros((2, 64, 64), np.uint8)
    masks[0, 5:20, 5:20] = 1
    masks[1, 30:50, 30:50] = 1
    qf = [{"query_feat": np.zeros(4), "cls_id": 0},
          {"query_feat": np.zeros(4), "cls_id": 1}]

    for cfg in (TrackerConfig(appearance_depth=18),
                TrackerConfig(appearance_depth=18,
                              remove_layers=("layer3", "layer4")),
                TrackerConfig(model_type="crw")):
        d, mt, rl = resolve_appearance_spec(cfg)
        app = make_appearance_model(depth=d, model_type=mt, remove_layers=rl)
        v = app.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        tracker = MaskAssociationTracker(cfg, appearance_variables=v)
        online, _ = tracker.update(frame, masks, qf)
        assert len(online) == 2, (cfg.model_type, cfg.remove_layers)
