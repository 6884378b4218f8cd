"""Relation-head training (reference: tools/rel_train.py:102-241).

TPU-native redesign of the reference's eager per-video loop:

- One jitted train step computes the full loss (pair zlpr + 5·reweighted BCE
  + span zlpr) and gradients; gradient accumulation (32 videos) happens by
  summing grads on device and applying Adam every k steps — the functional
  equivalent of the reference's loss/32 + backward + step.
- Variable video shapes (N tubes ≤ 100, T ≤ 900 frames, P pairs) are bucketed
  and zero-padded to a small set of static shapes so XLA compiles a handful
  of programs instead of one per video. Padding is masked out of every loss
  term (the span zlpr uses a masked mean over rows with nonzero GT, matching
  reshape_and_filter).
"""
from __future__ import annotations

import dataclasses
import random
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from openpvsg_tpu.config import RelationHeadConfig
from openpvsg_tpu.models.relation.heads import RelationModel
from openpvsg_tpu.models.relation.losses import rew_bce_loss, zlpr_loss
from openpvsg_tpu.models.relation.utils import (
    concatenate_sub_obj, generate_gt_matrix, get_gt_pairs)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


TUBE_BUCKETS = (20, 50, 100)
FRAME_BUCKETS = (128, 256, 512, 900)
PAIR_BUCKETS = (10, 25, 50)


@dataclasses.dataclass
class RelationBatch:
    """One padded video example (static shapes per bucket combination)."""
    feats: np.ndarray        # (N, T, D)
    tube_valid: np.ndarray   # (N,)
    frame_valid: np.ndarray  # (T,)
    pair_feats: np.ndarray   # (P, T, 2D)
    pair_valid: np.ndarray   # (P,)
    gt_matrix: np.ndarray    # (N, N)
    gt_span: np.ndarray      # (P, T, R)
    gt_prob: np.ndarray      # (P, R)


def subsample_video(feats: np.ndarray, gt_relations: List[Dict],
                    cfg: RelationHeadConfig, rng: random.Random):
    """Tube (≤ max_tubes, GT-first) + frame-window (≤ max_frames)
    subsampling (reference: rel_train.py:106-160)."""
    n = feats.shape[0]
    if n > cfg.max_tubes:
        unique = set()
        for rel in gt_relations:
            unique.add(int(rel["subject_index"]))
            unique.add(int(rel["object_index"]))
        if len(unique) > cfg.max_tubes:
            unique = set(rng.sample(sorted(unique), cfg.max_tubes))
        remaining = sorted(set(range(n)) - unique)
        extra = rng.sample(remaining, min(cfg.max_tubes - len(unique), len(remaining)))
        selected = list(unique) + extra
        feats = feats[selected]
        index_map = {old: new for new, old in enumerate(selected)}
        gt_relations = [
            {**rel,
             "subject_index": index_map[int(rel["subject_index"])],
             "object_index": index_map[int(rel["object_index"])]}
            for rel in gt_relations
            if int(rel["subject_index"]) in index_map
            and int(rel["object_index"]) in index_map
        ]
    t = feats.shape[1]
    if t > cfg.max_frames:
        start = rng.randint(0, t - cfg.max_frames)
        custom_span = (start, start + cfg.max_frames)
    else:
        custom_span = (0, t)
    feats = feats[:, custom_span[0]:custom_span[1]]
    return feats, gt_relations, custom_span


def build_batch(feats: np.ndarray, gt_relations: List[Dict],
                custom_span: Tuple[int, int], cfg: RelationHeadConfig,
                rng: random.Random) -> RelationBatch | None:
    """Pad one subsampled video to bucket shapes. Pair features here are
    placeholders (zeros) — they are recomputed inside the jitted step from
    encoded feats; we only carry the pair INDEX list."""
    n, t, d = feats.shape
    # dynamic pair budget (reference: num_top_pairs = min(50, 10000 // T))
    num_top_pairs = min(cfg.num_top_pairs // 2, max(10000 // max(t, 1), 1))
    pairs = get_gt_pairs(gt_relations, num_top_pairs, rng)
    if not pairs:
        return None

    nb = _bucket(n, TUBE_BUCKETS)
    tb = _bucket(t, FRAME_BUCKETS)
    pb = _bucket(len(pairs), PAIR_BUCKETS)

    feats_p = np.zeros((nb, tb, d), dtype=np.float32)
    feats_p[:n, :t] = feats
    tube_valid = np.zeros(nb, dtype=bool)
    tube_valid[:n] = True
    frame_valid = np.zeros(tb, dtype=bool)
    frame_valid[:t] = True

    gt_matrix = np.zeros((nb, nb), dtype=np.float32)
    for rel in gt_relations:
        gt_matrix[int(rel["subject_index"]), int(rel["object_index"])] = 1.0

    gt_span_full, gt_prob_full = generate_gt_matrix(
        gt_relations, pairs, (len(pairs), t, cfg.num_relations), custom_span)
    gt_span = np.zeros((pb, tb, cfg.num_relations), dtype=np.float32)
    gt_span[:len(pairs), :t] = gt_span_full
    gt_prob = np.zeros((pb, cfg.num_relations), dtype=np.float32)
    gt_prob[:len(pairs)] = gt_prob_full

    pair_idx = np.zeros((pb, 2), dtype=np.int32)
    pair_idx[:len(pairs)] = np.asarray(pairs, dtype=np.int32)
    pair_valid = np.zeros(pb, dtype=bool)
    pair_valid[:len(pairs)] = True

    return RelationBatch(
        feats=feats_p, tube_valid=tube_valid, frame_valid=frame_valid,
        pair_feats=pair_idx,  # indices, expanded on device
        pair_valid=pair_valid, gt_matrix=gt_matrix, gt_span=gt_span,
        gt_prob=gt_prob)


def make_loss_fn(model: RelationModel, relation_count: np.ndarray,
                 loss_prob_weight: float = 5.0):
    counts = jnp.asarray(relation_count, dtype=jnp.float32)

    def loss_fn(params, batch: Dict[str, jnp.ndarray]):
        feats = batch["feats"]
        # validity masks keep zero-padded tubes/frames out of every
        # attention and pooling op — padded results match unpadded exactly
        out = model.apply({"params": params}, feats,
                          tube_valid=batch["tube_valid"],
                          frame_valid=batch["frame_valid"])
        sub, obj = out["sub_feats"], out["obj_feats"]
        pred_matrix = out["pred_matrix"]

        tube_valid = batch["tube_valid"]
        pair_mask2d = tube_valid[:, None] & tube_valid[None, :]
        # pair zlpr over the flattened matrix; padding excluded by forcing
        # logits to a large negative where invalid (behaves like absent)
        pm = jnp.where(pair_mask2d, pred_matrix, -9999.0)
        gm = batch["gt_matrix"]
        loss_pair = zlpr_loss(gm.reshape(1, -1), pm.reshape(1, -1))

        # gather pair features on device
        pidx = batch["pair_idx"]
        pair_feats = jnp.concatenate([sub[pidx[:, 0]], obj[pidx[:, 1]]], axis=-1)
        span_pred, prob = model.apply({"params": params}, pair_feats,
                                      batch["frame_valid"],
                                      method=RelationModel.predict)

        pv = batch["pair_valid"].astype(jnp.float32)
        gt_prob = batch["gt_prob"]
        # reweighted BCE, masked mean over valid pairs
        pos_weight = counts.sum() / counts
        log_sig = jax.nn.log_sigmoid(prob)
        log_neg = jax.nn.log_sigmoid(-prob)
        bce = -(pos_weight * gt_prob * log_sig + (1 - gt_prob) * log_neg)
        loss_prob = (bce.mean(axis=-1) * pv).sum() / jnp.maximum(pv.sum(), 1)

        # span zlpr on rows with nonzero GT (masked equivalent of
        # reshape_and_filter): rows are (pair, relation) over time
        gt_span = batch["gt_span"]          # (P, T, R)
        fv = batch["frame_valid"].astype(jnp.float32)
        gt_rows = gt_span.transpose(0, 2, 1)       # (P, R, T)
        pred_rows = span_pred.transpose(0, 2, 1)
        row_mask = (jnp.any(gt_rows != 0, axis=-1)
                    & batch["pair_valid"][:, None])      # (P, R)
        # per-row zlpr with frame-padding forced inert
        yp = jnp.where(fv[None, None, :] > 0, pred_rows, -9999.0)
        yt = gt_rows
        ypn = (1 - 2 * yt) * yp - yt * 9999.0
        ypp = (1 - 2 * yt) * yp - (1 - yt) * 9999.0
        zeros = jnp.zeros_like(yp[..., :1])
        neg = jax.nn.logsumexp(jnp.concatenate([ypn, zeros], axis=-1), axis=-1)
        pos = jax.nn.logsumexp(jnp.concatenate([ypp, zeros], axis=-1), axis=-1)
        row_loss = neg + pos
        loss_span = (row_loss * row_mask).sum() / jnp.maximum(row_mask.sum(), 1)

        loss = loss_pair + loss_prob_weight * loss_prob + loss_span
        return loss, {"loss_pair": loss_pair, "loss_prob": loss_prob,
                      "loss_span": loss_span}

    return loss_fn


def make_train_step(model: RelationModel, relation_count: np.ndarray,
                    loss_prob_weight: float = 5.0):
    loss_fn = make_loss_fn(model, relation_count, loss_prob_weight)

    @jax.jit
    def grad_step(params, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        return loss, aux, grads

    return grad_step


def make_batched_train_step(model: RelationModel, relation_count: np.ndarray,
                            loss_prob_weight: float, mesh):
    """One sharded grad step over a (B, ...) stack of same-bucket videos:
    the batch axis is sharded over the mesh 'data' axis, weights (B,) mask
    padding videos, and the returned grads/loss are SUMS over the weighted
    videos (XLA inserts the psum over ICI). Summing — not averaging — keeps
    the accumulate-then-divide semantics identical to the sequential
    RelationTrainer (reference: rel_train.py loss/32 + backward)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    loss_fn = make_loss_fn(model, relation_count, loss_prob_weight)

    def total_loss(params, batch, weights):
        losses, auxes = jax.vmap(partial(loss_fn, params))(batch)
        total = (losses * weights).sum()
        aux = {k: (v * weights).sum() for k, v in auxes.items()}
        return total, aux

    rep = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))

    @partial(jax.jit, in_shardings=(rep, sharded, sharded))
    def grad_step(params, batch, weights):
        (loss, aux), grads = jax.value_and_grad(
            total_loss, has_aux=True)(params, batch, weights)
        return loss, aux, grads

    return grad_step


class RelationTrainer:
    """Adam + gradient accumulation driver (reference: rel_train.py:62,
    205-215 — accumulation_steps=32, lr 1e-4)."""

    def __init__(self, cfg: RelationHeadConfig, relation_count: np.ndarray,
                 rng_seed: int = 0):
        self.cfg = cfg
        self.model = RelationModel.from_config(cfg)
        self.rng = random.Random(rng_seed)
        key = jax.random.PRNGKey(rng_seed)
        feats0 = jnp.zeros((TUBE_BUCKETS[0], FRAME_BUCKETS[0], cfg.d_model))
        pair0 = jnp.zeros((PAIR_BUCKETS[0], FRAME_BUCKETS[0], 2 * cfg.d_model))
        self.params = self.model.init(key, feats0, pair0)["params"]
        self.tx = optax.adam(cfg.lr)
        self.opt_state = self.tx.init(self.params)
        self.grad_step = make_train_step(self.model, relation_count,
                                         cfg.loss_prob_weight)
        # one fused device call per accumulate/apply instead of one dispatch
        # per gradient leaf (dispatch latency dominates on remote devices)
        # donate the running accumulator / params+opt_state so the update
        # happens in place (no fresh HBM buffers per accumulate/apply)
        self._accum_fn = jax.jit(lambda a, g: jax.tree.map(jnp.add, a, g),
                                 donate_argnums=(0,))

        def _apply(params, opt_state, accum, count):
            grads = jax.tree.map(lambda g: g / count, accum)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt

        self._apply_fn = jax.jit(_apply, donate_argnums=(0, 1))
        self._accum = None
        self._accum_count = 0

    def _to_device_batch(self, b: RelationBatch) -> Dict[str, jnp.ndarray]:
        return {
            "feats": jnp.asarray(b.feats),
            "tube_valid": jnp.asarray(b.tube_valid),
            "frame_valid": jnp.asarray(b.frame_valid),
            "pair_idx": jnp.asarray(b.pair_feats),
            "pair_valid": jnp.asarray(b.pair_valid),
            "gt_matrix": jnp.asarray(b.gt_matrix),
            "gt_span": jnp.asarray(b.gt_span),
            "gt_prob": jnp.asarray(b.gt_prob),
        }

    def step(self, feats: np.ndarray, gt_relations: List[Dict]):
        """Accumulate gradients for one video; applies Adam every
        accumulation_steps videos. Returns (loss, aux) or None if skipped."""
        feats, gt_relations, custom_span = subsample_video(
            feats, gt_relations, self.cfg, self.rng)
        batch = build_batch(feats, gt_relations, custom_span, self.cfg, self.rng)
        if batch is None:
            return None
        loss, aux, grads = self.grad_step(self.params, self._to_device_batch(batch))
        if self._accum is None:
            self._accum = grads
        else:
            self._accum = self._accum_fn(self._accum, grads)
        self._accum_count += 1
        if self._accum_count >= self.cfg.accumulation_steps:
            self.flush()
        return float(loss), {k: float(v) for k, v in aux.items()}

    def flush(self):
        if self._accum is None or self._accum_count == 0:
            return
        self.params, self.opt_state = self._apply_fn(
            self.params, self.opt_state, self._accum,
            jnp.float32(self._accum_count))
        self._accum = None
        self._accum_count = 0


class DataParallelRelationTrainer(RelationTrainer):
    """Relation training with gradient accumulation sharded over the mesh's
    'data' axis (VERDICT r2 #1a; reference bar being beaten: strictly
    sequential 1-GPU accumulation, tools/rel_train.py:205-215).

    Videos are bucketed to static shapes exactly like the sequential
    trainer; same-bucket videos queue host-side until `n_data` are ready,
    then ONE sharded jit computes all their grads (summed via psum over
    ICI) — so an 8-chip mesh turns the 32-video sequential accumulate into
    4 device steps. Accumulated-gradient semantics are identical to the
    sequential path (per-video grads are independent and summed, then
    divided by the video count at the Adam apply); only the APPLY timing
    can differ when mixed buckets leave partial queues across an
    accumulation boundary — flush() drains them.
    """

    def __init__(self, cfg: RelationHeadConfig, relation_count: np.ndarray,
                 mesh, rng_seed: int = 0):
        super().__init__(cfg, relation_count, rng_seed)
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.n_data = mesh.shape["data"]
        rep = NamedSharding(mesh, P())
        self.params = jax.device_put(self.params, rep)
        self.opt_state = jax.device_put(self.opt_state, rep)
        self._sharded = NamedSharding(mesh, P("data"))
        self._batched_step = make_batched_train_step(
            self.model, relation_count, cfg.loss_prob_weight, mesh)
        self._queues: Dict[tuple, List[RelationBatch]] = {}

    def step(self, feats: np.ndarray, gt_relations: List[Dict]):
        """Queue one video; runs a sharded grad step when its bucket fills.
        Returns (mean loss, aux) for the step that ran, else None."""
        feats, gt_relations, custom_span = subsample_video(
            feats, gt_relations, self.cfg, self.rng)
        batch = build_batch(feats, gt_relations, custom_span, self.cfg,
                            self.rng)
        if batch is None:
            return None
        key = (batch.feats.shape, batch.pair_feats.shape[0])
        self._queues.setdefault(key, []).append(batch)
        if len(self._queues[key]) < self.n_data:
            return None
        res = self._run_queue(key)
        if self._accum_count >= self.cfg.accumulation_steps:
            super().flush()
        return res

    def _run_queue(self, key) -> Tuple[float, Dict[str, float]]:
        batches = self._queues.pop(key)
        n_valid = len(batches)
        while len(batches) < self.n_data:   # pad partial queues, weight 0
            batches.append(batches[0])
        stacked = {
            "feats": np.stack([b.feats for b in batches]),
            "tube_valid": np.stack([b.tube_valid for b in batches]),
            "frame_valid": np.stack([b.frame_valid for b in batches]),
            "pair_idx": np.stack([b.pair_feats for b in batches]),
            "pair_valid": np.stack([b.pair_valid for b in batches]),
            "gt_matrix": np.stack([b.gt_matrix for b in batches]),
            "gt_span": np.stack([b.gt_span for b in batches]),
            "gt_prob": np.stack([b.gt_prob for b in batches]),
        }
        weights = np.zeros(self.n_data, np.float32)
        weights[:n_valid] = 1.0
        stacked = {k: jax.device_put(jnp.asarray(v), self._sharded)
                   for k, v in stacked.items()}
        loss_sum, aux, grads = self._batched_step(
            self.params, stacked, jax.device_put(jnp.asarray(weights),
                                                 self._sharded))
        if self._accum is None:
            self._accum = grads
        else:
            self._accum = self._accum_fn(self._accum, grads)
        self._accum_count += n_valid
        return (float(loss_sum) / n_valid,
                {k: float(v) / n_valid for k, v in aux.items()})

    def flush(self):
        """Drain every partial bucket queue, then apply the accumulated
        gradient (epoch boundary / end of training)."""
        for key in list(self._queues):
            if self._queues[key]:
                self._run_queue(key)
        super().flush()
