"""Structured metrics logging.

Replaces the reference's TextLoggerHook/WandbLoggerHook pair (reference:
configs/mask2former_vps/mask2former_video_r50.py:70-80) with a dependency-
free JSONL metrics stream + optional wandb passthrough when available.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, work_dir: str, use_wandb: bool = False,
                 wandb_kwargs: Optional[Dict] = None):
        os.makedirs(work_dir, exist_ok=True)
        self.path = os.path.join(work_dir, "metrics.jsonl")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(**(wandb_kwargs or {}))
                self._wandb = wandb
            except Exception:
                self._wandb = None  # wandb not installed / offline: JSONL only

    def log(self, metrics: Dict, step: Optional[int] = None):
        row = {"time": time.time(), **({"step": step} if step is not None else {}),
               **{k: float(v) for k, v in metrics.items()
                  if isinstance(v, (int, float)) or hasattr(v, "item")}}
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self._wandb is not None:
            self._wandb.log(row, step=step)
