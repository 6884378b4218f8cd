"""Shared CLI plumbing for the tools (config loading, logging, seeding)."""
from __future__ import annotations

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Some images pin JAX_PLATFORMS via sitecustomize before user env applies;
# OPENPVSG_PLATFORM wins regardless (e.g. =cpu for tests/debug).
if os.environ.get("OPENPVSG_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["OPENPVSG_PLATFORM"])

from openpvsg_tpu.config import PVSGConfig, apply_overrides, get_config, parse_set_args


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", default="mask2former_ips",
                   help="config preset name")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--anno-file", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE",
                   help="dotted config overrides (the --cfg-options equivalent)")
    # multi-host distributed init (replaces the reference's mmcv init_dist
    # slurm/pytorch/mpi launchers, tools/train.py:84-87,173): one process per
    # host, XLA collectives over ICI/DCN instead of NCCL.
    p.add_argument("--dist-init", action="store_true",
                   help="call jax.distributed.initialize() with "
                        "auto-discovery (TPU pod runtime)")
    p.add_argument("--dist-coordinator", default=None, metavar="HOST:PORT",
                   help="explicit coordinator address (non-TPU clusters)")
    p.add_argument("--dist-num-processes", type=int, default=None)
    p.add_argument("--dist-process-id", type=int, default=None)
    p.add_argument("--n-time", type=int, default=1, metavar="K",
                   help="mesh 'time'-axis size: devices form a "
                        "(n_devices/K, K) (data, time) mesh and relation "
                        "scoring shards the frame axis over 'time' "
                        "(TimeShardedRelation); 1 = pure data axis")
    return p


def init_distributed(args) -> None:
    """Multi-host runtime init. No-op unless --dist-init/--dist-coordinator
    is given, so single-host invocations are unchanged. Must run before any
    backend initializes, hence called at the top of load_config."""
    coord = getattr(args, "dist_coordinator", None)
    if not (coord or getattr(args, "dist_init", False)):
        return
    import jax

    kwargs = {}
    if coord:
        if args.dist_num_processes is None or args.dist_process_id is None:
            raise SystemExit(
                "--dist-coordinator requires --dist-num-processes and "
                "--dist-process-id")
        kwargs = dict(coordinator_address=coord,
                      num_processes=args.dist_num_processes,
                      process_id=args.dist_process_id)
    jax.distributed.initialize(**kwargs)


def reject_unused_n_time(args) -> None:
    """--n-time lives in base_parser so every tool accepts it syntactically,
    but only tools with a relation-scoring stage (rel_test, rel_test_full,
    end2end_inference) route it into a (data, time) mesh. Tools that shard
    only the 'data' axis must fail loudly rather than silently ignore it."""
    if getattr(args, "n_time", 1) != 1:
        raise SystemExit(
            "--n-time > 1 is only meaningful for tools with a relation "
            "scoring stage (rel_test, rel_test_full, end2end_inference); "
            "this tool shards only the 'data' axis")


def maybe_mesh(min_devices: int = 2, n_time: int = 1):
    """A ('data', 'time') mesh for the tools' frame-/batch-sharded
    inference, or None when only one device is visible. n_time > 1 carves
    the devices into a (n/k, k) grid so the relation stage can shard the
    frame axis over 'time' (parallel/tp.py).

    Multi-process runs use THIS PROCESS's devices only: the tools stride
    the per-video work list across processes (partition_videos), so each
    process runs independent computations on different videos — a global
    mesh would require all processes to execute identical programs in
    lockstep. Local meshes + file-level result collection ≡ the
    reference's independent multi_gpu_test workers. (Training is
    different: SegmenterTrainer builds its own global mesh for lockstep
    DP steps.)"""
    import jax

    devices = jax.local_devices() if jax.process_count() > 1 \
        else jax.devices()
    if len(devices) < max(min_devices, n_time):
        return None
    from openpvsg_tpu.parallel.mesh import make_mesh

    if len(devices) % n_time:
        raise SystemExit(
            f"--n-time {n_time} does not divide the {len(devices)} visible "
            "devices")
    return make_mesh(n_data=len(devices) // n_time, n_time=n_time,
                     devices=devices)


def partition_videos(videos):
    """Per-video work split across processes in a multi-host run
    (reference: multi_gpu_test rank-strided dataset sharding,
    tools/prepare_query_tube_ips.py:248-250 — result collection is
    file-level: each process writes its own videos into the shared
    work_dir). Identity on single-process runs."""
    import jax

    n = jax.process_count()
    if n <= 1:
        return list(videos)
    return list(videos)[jax.process_index()::n]


def collect_rank_results(work_dir: str, name: str, payload):
    """File-level multi-host result collection (reference: mmcv
    collect_results_cpu used by multi_gpu_test, e.g.
    tools/prepare_query_tube_ips.py:248-250): each process pickles its
    payload as {name}_rank{i}.pkl in the shared work_dir; after a barrier,
    process 0 returns the list of all payloads (other processes get None).
    Single-process runs return [payload] without touching disk."""
    import pickle

    import jax

    if jax.process_count() <= 1:
        return [payload]
    os.makedirs(work_dir, exist_ok=True)
    path = os.path.join(work_dir, f"{name}_rank{jax.process_index()}.pkl")
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(f"collect_{name}")
    if jax.process_index() != 0:
        return None
    out = []
    for i in range(jax.process_count()):
        with open(os.path.join(work_dir, f"{name}_rank{i}.pkl"), "rb") as f:
            out.append(pickle.load(f))
    return out


def load_config(args) -> PVSGConfig:
    init_distributed(args)
    cfg = get_config(args.config)
    cfg = apply_overrides(cfg, parse_set_args(args.set))
    if args.work_dir:
        cfg = apply_overrides(cfg, {"data.work_dir": args.work_dir})
    if args.data_dir:
        cfg = apply_overrides(cfg, {"data.data_dir": args.data_dir})
    if args.anno_file:
        cfg = apply_overrides(cfg, {"data.anno_file": args.anno_file})
    return cfg


def setup_logging(work_dir: str, name: str) -> logging.Logger:
    os.makedirs(work_dir, exist_ok=True)
    ts = time.strftime("%Y%m%d_%H%M%S")
    logger = logging.getLogger("openpvsg_tpu")
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    fh = logging.FileHandler(os.path.join(work_dir, f"{ts}_{name}.log"))
    fh.setFormatter(fmt)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.handlers = [fh, sh]
    return logger
