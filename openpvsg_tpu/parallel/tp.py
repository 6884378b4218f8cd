"""Time-axis (sequence) parallelism for the relation head.

The reference scores relations over up-to-900-frame tube features on one GPU
(reference: models/relation_head/base.py; datasets/pvsg.py bucketing). The
TPU-native replacement shards the FRAME axis over the mesh's 'time' axis —
SURVEY §5's "natural TPU win" for long-context relation scoring:

- ObjectEncoder attends across tubes *per frame* (frames independent), so a
  time-sharded input runs with zero collectives.
- PairProposalNetwork's temporal max and the span heads reduce over T; XLA
  lowers the reduction over the sharded axis to an all-reduce over ICI.
- TemporalTransformer's frame-to-frame attention needs cross-shard K/V; the
  sharding annotations make XLA:SPMD insert the all-gather.

No shard_map, no hand-written collectives: the module code is identical to
single-device; `jit` + `NamedSharding` annotations produce the SPMD program
(the scaling-book recipe). Padding frames to the shard multiple is masked
out exactly via frame_valid (tests/test_relation_padding.py semantics).

Pairs are simultaneously sharded over 'data', so a (data, time) mesh runs
pair-parallel x frame-parallel.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _pad_axis(x: np.ndarray, axis: int, mult: int) -> Tuple[np.ndarray, int]:
    n = x.shape[axis]
    rem = (-n) % mult
    if rem:
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, rem)
        x = np.pad(x, pad)
    return x, n


class TimeShardedRelation:
    """Persistent executor for the relation head over a (data, time) mesh.

    feats enter (N_tubes, T, D) host-side; T is sharded over 'time', pairs
    over 'data'. Weights are replicated once; both stages are jitted once.
    """

    def __init__(self, mesh: Mesh, model, params):
        self.mesh = mesh
        self.model = model
        self.n_time = mesh.shape["time"]
        self.n_data = mesh.shape["data"]
        self.params = jax.device_put(params, NamedSharding(mesh, P()))

        def fwd(params, feats, tube_valid, frame_valid):
            return model.apply({"params": params}, feats,
                               tube_valid=tube_valid, frame_valid=frame_valid)

        def predict(params, pair_feats, frame_valid):
            return model.apply({"params": params}, pair_feats, frame_valid,
                               method=type(model).predict)

        def pair_gather(sub, obj, s_idx, o_idx, frame_valid):
            # device-side pair gather (r4 wire discipline, eval/rel_eval
            # docstring): encoder outputs never leave the mesh; only pair
            # indices come up and binarized spans go down. The gather is
            # over the replicated tube axis, so it is collective-free; the
            # constraint reshards the gathered pairs over 'data'. Invalid
            # frames are zeroed to match the host-built pair tensor
            # bit-for-bit, and the predict stage reuses self._predict —
            # the SAME executable the host-gather oracle runs — so the two
            # modes are bitwise identical (see eval/rel_eval._gather_fn on
            # why sharing the executable, not the formula, is what makes
            # parity exact).
            pair = jnp.concatenate([jnp.take(sub, s_idx, axis=0),
                                    jnp.take(obj, o_idx, axis=0)], axis=-1)
            pair = pair * frame_valid[None, :, None]
            return jax.lax.with_sharding_constraint(
                pair, NamedSharding(mesh, P("data", "time", None)))

        rep = NamedSharding(mesh, P())
        self._fwd = jax.jit(
            fwd,
            in_shardings=(rep, NamedSharding(mesh, P(None, "time", None)),
                          rep, rep))
        self._predict = jax.jit(
            predict,
            in_shardings=(rep,
                          NamedSharding(mesh, P("data", "time", None)),
                          rep))
        self._pair_gather = jax.jit(pair_gather)
        self._binarize = jax.jit(lambda s: s > 0)

    def _frame_valid(self, frame_valid: Optional[np.ndarray], t: int,
                     t_pad: int) -> jnp.ndarray:
        """Extend the caller's frame validity (bucket padding from
        eval/rel_eval) with False for the shard-multiple padding; default
        is all-valid over the input T."""
        fv = np.ones(t, bool) if frame_valid is None \
            else np.asarray(frame_valid, bool)
        out = np.zeros(t_pad, bool)
        out[:t] = fv
        return jnp.asarray(out)

    def propose(self, feats: np.ndarray,
                tube_valid: Optional[np.ndarray] = None,
                frame_valid: Optional[np.ndarray] = None):
        """feats: (N, T, D) -> dict(sub_feats, obj_feats, pred_matrix) with
        the frame axis sharded over 'time'. Outputs cover the original T."""
        n, t = feats.shape[:2]
        feats, _ = _pad_axis(np.asarray(feats), 1, self.n_time)
        if tube_valid is None:
            tube_valid = np.ones((n,), bool)
        out = self._fwd(self.params, jnp.asarray(feats),
                        jnp.asarray(tube_valid),
                        self._frame_valid(frame_valid, t, feats.shape[1]))
        return {"sub_feats": out["sub_feats"][:, :t],
                "obj_feats": out["obj_feats"][:, :t],
                "pred_matrix": out["pred_matrix"]}

    def predict_pairs(self, out, idx: np.ndarray,
                      frame_valid: Optional[np.ndarray] = None):
        """Device-side pair gather + predict over the mesh.

        out: propose()'s dict with sub/obj feats still device-resident;
        idx: (P_padded, 2) int32 subject/object tube indices (padded rows
        point at tube 0 — per-pair rows are batch-independent in every
        temporal head, so they cannot perturb real rows). Returns
        (span > 0 (P_padded, T, R) bool, prob (P_padded, R)); only the
        index upload and these downloads cross the wire.
        """
        sub, obj = out["sub_feats"], out["obj_feats"]
        t = sub.shape[1]
        idx, _ = _pad_axis(np.asarray(idx, np.int32), 0, self.n_data)
        fv = self._frame_valid(frame_valid, t, t)
        pair = self._pair_gather(jnp.asarray(sub), jnp.asarray(obj),
                                 jnp.asarray(idx[:, 0]),
                                 jnp.asarray(idx[:, 1]), fv)
        span, prob = self._predict(self.params, pair, fv)
        return np.asarray(self._binarize(span)), np.asarray(prob)

    def predict(self, pair_feats: np.ndarray,
                frame_valid: Optional[np.ndarray] = None):
        """pair_feats: (P, T, 2D) -> (span (P, T, R), prob (P, R)); the pair
        axis is sharded over 'data', frames over 'time'."""
        p, t = pair_feats.shape[:2]
        x, _ = _pad_axis(np.asarray(pair_feats), 0, self.n_data)
        x, _ = _pad_axis(x, 1, self.n_time)
        span, prob = self._predict(self.params, jnp.asarray(x),
                                   self._frame_valid(frame_valid, t,
                                                     x.shape[1]))
        return span[:p, :t], prob[:p]
