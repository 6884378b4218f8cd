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
    return p


def load_config(args) -> PVSGConfig:
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
