"""Relation-head models (flax).

Rebuild of the reference relation heads (reference:
models/relation_head/base.py, transformer.py, convolution.py):

- ObjectEncoder: 2-layer post-norm transformer encoder (d=256, 8 heads,
  ff 512). NOTE the reference feeds [N_tubes, T, 256] into a non-batch-first
  torch encoder, so attention runs ACROSS TUBES independently per frame
  (base.py:39-40); reproduced faithfully here.
- PairProposalNetwork: the reference's O(N²) python double loop (base.py:
  51-62) becomes one broadcast: MLP(concat(s_i, o_j)) == relu(W_s s_i +
  W_o o_j + b) — a rank-1 decomposition that XLA maps to two matmuls.
- TemporalTransformer / HandcraftedFilter / Learnable1DConv / VanillaModel:
  per-pair temporal models producing span logits (P, T, R) and max-pooled
  relation logits (P, R).
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from openpvsg_tpu.models.position_encoding import sine_embed_1d
from openpvsg_tpu.models.transformer_decoder import MultiheadAttention


class TorchEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer semantics: post-norm, relu FFN.
    `mask` (B, L, L) bool (True = may attend) implements key-padding
    exclusion so zero-padded batch entries cannot perturb valid tokens."""
    d_model: int
    num_heads: int
    dim_ff: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (B, L, D)
        attn = MultiheadAttention(self.num_heads, self.d_model, self.dtype,
                                  name="self_attn")(x, x, x, mask=mask)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + attn)
        y = nn.Dense(self.dim_ff, dtype=self.dtype, name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(y)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + y)


class ObjectEncoder(nn.Module):
    feature_dim: int = 256
    hidden_dim: int = 512
    num_heads: int = 8
    num_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, tube_valid: jnp.ndarray | None = None):
        """feats: (N_tubes, T, D). Attention across the tube axis per frame
        (the reference's effective behavior — see module docstring).
        tube_valid (N_tubes,) bool excludes zero-padded tubes from every
        attention so padded batches match unpadded results exactly.
        Returns (N_tubes, T, D)."""
        x = feats.transpose(1, 0, 2)  # (T, N, D): frames as batch
        mask = None
        if tube_valid is not None:
            T = x.shape[0]
            N = x.shape[1]
            mask = jnp.broadcast_to(tube_valid[None, None, :], (T, N, N))
        for i in range(self.num_layers):
            x = TorchEncoderLayer(self.feature_dim, self.num_heads,
                                  self.hidden_dim, self.dtype,
                                  name=f"layer_{i}")(x, mask=mask)
        return x.transpose(1, 0, 2)


class PairProposalNetwork(nn.Module):
    feature_dim: int = 256
    hidden_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, encoded_subjects: jnp.ndarray,
                 encoded_objects: jnp.ndarray,
                 frame_valid: jnp.ndarray | None = None) -> jnp.ndarray:
        """(N, T, D) x2 -> (N, N) pair logits, diagonal = 0 (the reference
        never fills i == j). frame_valid (T,) excludes zero-padded frames
        from the temporal max."""
        if frame_valid is not None:
            neg = jnp.finfo(encoded_subjects.dtype).min
            fv = frame_valid[None, :, None]
            encoded_subjects = jnp.where(fv, encoded_subjects, neg)
            encoded_objects = jnp.where(fv, encoded_objects, neg)
        sub = encoded_subjects.max(axis=1)  # (N, D)
        obj = encoded_objects.max(axis=1)
        # MLP(concat(s, o)) decomposed: first Dense splits into W_s, W_o
        d = self.feature_dim
        w = self.param("fc1_kernel", nn.initializers.lecun_normal(),
                       (2 * d, self.hidden_dim))
        b = self.param("fc1_bias", nn.initializers.zeros, (self.hidden_dim,))
        a_s = sub @ w[:d]                   # (N, H)
        a_o = obj @ w[d:]                   # (N, H)
        hidden = nn.relu(a_s[:, None, :] + a_o[None, :, :] + b)  # (N, N, H)
        score = nn.Dense(1, dtype=self.dtype, name="fc2")(hidden)[..., 0]
        n = score.shape[0]
        return score * (1.0 - jnp.eye(n, dtype=score.dtype))


class _PredHeads(nn.Module):
    """Shared fc1-fc2-span/pred head stack used by every temporal model.
    frame_valid (T,) excludes zero-padded frames from the relation max."""
    input_dim: int
    num_relations: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, frame_valid=None):
        x = nn.relu(nn.Dense(self.input_dim // 2, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.input_dim // 4, dtype=self.dtype, name="fc2")(x))
        span = nn.Dense(self.num_relations, dtype=self.dtype, name="span_head")(x)
        pred = nn.Dense(self.num_relations, dtype=self.dtype, name="pred_head")(x)
        if frame_valid is not None:
            pred = jnp.where(frame_valid[None, :, None], pred,
                             jnp.finfo(pred.dtype).min)
        return span, pred.max(axis=1)


class VanillaModel(nn.Module):
    input_dim: int = 512
    num_relations: int = 57
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, frame_valid=None):
        """x: (P, T, 2D) -> (span (P, T, R), relation (P, R))."""
        return _PredHeads(self.input_dim, self.num_relations, self.dtype,
                          name="heads")(x, frame_valid)


class TemporalTransformer(nn.Module):
    input_dim: int = 512
    num_relations: int = 57
    num_layers: int = 1
    num_heads: int = 4
    dim_ff: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, frame_valid=None):
        """x: (P, T, 2D); frame_valid (T,) masks padded frames out of the
        temporal attention and the relation max."""
        T = x.shape[1]
        x = x + sine_embed_1d(T, self.input_dim).astype(x.dtype)[None]
        mask = None
        if frame_valid is not None:
            P = x.shape[0]
            mask = jnp.broadcast_to(frame_valid[None, None, :], (P, T, T))
        for i in range(self.num_layers):
            x = TorchEncoderLayer(self.input_dim, self.num_heads, self.dim_ff,
                                  self.dtype, name=f"layer_{i}")(x, mask=mask)
        x = nn.LayerNorm(dtype=self.dtype, name="final_norm")(x)
        return _PredHeads(self.input_dim, self.num_relations, self.dtype,
                          name="heads")(x, frame_valid)


class HandcraftedFilter(nn.Module):
    """Fixed binomial 1-D temporal smoothing (depthwise conv, kernel
    [1/4, 1/2, 1, 1/2, 1/4]) before the heads."""
    input_dim: int = 512
    num_relations: int = 57
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, frame_valid=None):
        kernel = jnp.asarray([0.25, 0.5, 1.0, 0.5, 0.25], dtype=x.dtype)
        # depthwise conv over time: (P, T, D)
        pad = 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        out = sum(kernel[i] * xp[:, i:i + x.shape[1], :] for i in range(5))
        return _PredHeads(self.input_dim, self.num_relations, self.dtype,
                          name="heads")(out, frame_valid)


class Learnable1DConv(nn.Module):
    input_dim: int = 512
    num_relations: int = 57
    kernel_size: int = 5
    num_layers: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, frame_valid=None):
        for i in range(self.num_layers):
            x = nn.Conv(self.input_dim, (self.kernel_size,),
                        padding=((self.kernel_size // 2,) * 2,),
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.relu(x)
        return _PredHeads(self.input_dim, self.num_relations, self.dtype,
                          name="heads")(x, frame_valid)


class RelationModel(nn.Module):
    """Full relation head: subject/object encoders + pair proposal +
    temporal model, mirroring the 4-model bundle of tools/rel_train.py.

    Capacity knobs default to the reference's fixed hyperparameters
    (base.py:29-37, transformer.py:19-26, convolution.py:43-50), so the
    default param tree is unchanged; non-default values enable capacity
    studies (RelationHeadConfig carries them — use `from_config`)."""
    model_name: str = "transformer"
    feature_dim: int = 256
    pair_hidden: int = 1024
    num_relations: int = 57
    encoder_layers: int = 2
    encoder_heads: int = 8
    encoder_ffn: int = 512
    temporal_layers: int = 1
    temporal_heads: int = 4
    temporal_ffn: int = 512
    conv_kernel: int = 5
    # beyond-reference (off by default — param tree matches the reference
    # exactly when False): augment the temporal model's pair input
    # [s, o] with explicit interaction terms [s - o, s * o]. Motivated by
    # the rich-synthetic capacity study: every reference head UNDERFITS
    # pairwise-geometry predicates (train R@K ~ val R@K, both low) because
    # the MLP must compute pair geometry from concatenated unary features;
    # difference/product terms make it near-linear. Wire format unchanged —
    # pair_feats stays (P, T, 2D); augmentation happens inside predict().
    pair_interaction: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg, model_name: str | None = None,
                    dtype: Any = jnp.float32) -> "RelationModel":
        """Build from a RelationHeadConfig, honoring every capacity knob."""
        return cls(model_name=model_name or cfg.model_name,
                   feature_dim=cfg.d_model,
                   num_relations=cfg.num_relations,
                   encoder_layers=cfg.encoder_layers,
                   encoder_heads=cfg.encoder_heads,
                   encoder_ffn=cfg.encoder_ffn,
                   temporal_layers=getattr(cfg, "temporal_layers", 1),
                   temporal_heads=cfg.temporal_heads,
                   temporal_ffn=cfg.temporal_ffn,
                   conv_kernel=cfg.conv_kernel,
                   pair_interaction=getattr(cfg, "pair_interaction", False),
                   dtype=dtype)

    def setup(self):
        self.subject_encoder = ObjectEncoder(
            self.feature_dim, self.encoder_ffn, self.encoder_heads,
            self.encoder_layers, dtype=self.dtype)
        self.object_encoder = ObjectEncoder(
            self.feature_dim, self.encoder_ffn, self.encoder_heads,
            self.encoder_layers, dtype=self.dtype)
        self.pair_proposal = PairProposalNetwork(self.feature_dim,
                                                 self.pair_hidden, self.dtype)
        in_mult = 4 if self.pair_interaction else 2
        self.temporal = build_relation_model(
            self.model_name, in_mult * self.feature_dim, self.num_relations,
            self.dtype, num_layers=self.temporal_layers,
            num_heads=self.temporal_heads, dim_ff=self.temporal_ffn,
            kernel_size=self.conv_kernel)

    def encode(self, feats, tube_valid=None):
        return (self.subject_encoder(feats, tube_valid),
                self.object_encoder(feats, tube_valid))

    def propose_pairs(self, sub_feats, obj_feats, frame_valid=None):
        return self.pair_proposal(sub_feats, obj_feats, frame_valid)

    def predict(self, pair_feats, frame_valid=None):
        if self.pair_interaction:
            s, o = jnp.split(pair_feats, 2, axis=-1)
            pair_feats = jnp.concatenate([pair_feats, s - o, s * o], axis=-1)
        return self.temporal(pair_feats, frame_valid)

    def __call__(self, feats, pair_feats=None, tube_valid=None,
                 frame_valid=None):
        sub_feats, obj_feats = self.encode(feats, tube_valid)
        pred_matrix = self.propose_pairs(sub_feats, obj_feats, frame_valid)
        out = {"sub_feats": sub_feats, "obj_feats": obj_feats,
               "pred_matrix": pred_matrix}
        if pair_feats is not None:
            span, prob = self.predict(pair_feats, frame_valid)
            out.update(span_pred=span, prob=prob)
        return out


def build_relation_model(name: str, input_dim: int, num_relations: int,
                         dtype: Any = jnp.float32, num_layers: int = 1,
                         num_heads: int = 4, dim_ff: int = 512,
                         kernel_size: int = 5) -> nn.Module:
    table: dict[str, Callable[..., nn.Module]] = {
        "vanilla": VanillaModel,
        "filter": HandcraftedFilter,
        "conv": Learnable1DConv,
        "transformer": TemporalTransformer,
    }
    if name not in table:
        raise ValueError(f"Model {name} unsupported")
    kwargs: dict = {}
    if name == "transformer":
        kwargs = dict(num_layers=num_layers, num_heads=num_heads,
                      dim_ff=dim_ff)
    elif name == "conv":
        kwargs = dict(num_layers=num_layers, kernel_size=kernel_size)
    return table[name](input_dim=input_dim, num_relations=num_relations,
                       dtype=dtype, **kwargs)
