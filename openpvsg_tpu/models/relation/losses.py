"""Relation-head losses (reference: models/relation_head/train_utils.py:6-27)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def zlpr_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Multi-label log-sum-exp loss (https://kexue.fm/archives/7359).

    y_true: binary targets (..., C); y_pred: logits. Mean over the leading
    axes, matching the reference exactly (train_utils.py:14-27).
    """
    y_pred = (1 - 2 * y_true) * y_pred
    y_pred_neg = y_pred - y_true * 9999.0
    y_pred_pos = y_pred - (1 - y_true) * 9999.0
    zeros = jnp.zeros_like(y_pred[..., :1])
    neg = jax.nn.logsumexp(jnp.concatenate([y_pred_neg, zeros], axis=-1), axis=-1)
    pos = jax.nn.logsumexp(jnp.concatenate([y_pred_pos, zeros], axis=-1), axis=-1)
    return (neg + pos).mean()


def rew_bce_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                 class_counts: jnp.ndarray) -> jnp.ndarray:
    """Class-frequency-reweighted BCE-with-logits: pos_weight =
    total_count / class_count (reference: train_utils.py:6-11; torch
    BCEWithLogitsLoss pos_weight semantics)."""
    pos_weight = class_counts.sum() / class_counts
    log_sig = jax.nn.log_sigmoid(y_pred)
    log_one_minus = jax.nn.log_sigmoid(-y_pred)
    loss = -(pos_weight * y_true * log_sig + (1 - y_true) * log_one_minus)
    return loss.mean()
