"""Scalar logging: JSONL always, TensorBoard when available.

Capability parity: the reference's tracker logging (`accelerator.log` to
tensorboard/wandb, `/root/reference/training/train.py:392-396,574-575`) plus the
per-run resolved-argument dump every reference CLI writes."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Mapping, Optional


class ScalarLogger:
    """Append scalars to <dir>/metrics.jsonl and (if tensorboard is importable) to
    TB event files under <dir>/tb."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True, use_wandb: bool = False,
                 wandb_project: Optional[str] = None):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        self._wandb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except Exception:
                self._tb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(project=wandb_project or "diffusion-e2e-ft-tpu", dir=log_dir)
                self._wandb = wandb
            except Exception:
                self._wandb = None

    def log(self, step: int, scalars: Mapping[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))
        if self._wandb is not None:
            self._wandb.log(dict(scalars), step=int(step))

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


def write_arguments(path_dir: str, arguments: Mapping, filename: str = "arguments.txt") -> None:
    """Dump the resolved run configuration (every reference CLI writes this record)."""
    os.makedirs(path_dir, exist_ok=True)
    with open(os.path.join(path_dir, filename), "w") as f:
        for k in sorted(arguments):
            f.write(f"{k}: {arguments[k]}\n")
