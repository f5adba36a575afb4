"""Metric logging: TensorBoard (always) + optional Weights & Biases.

Reference-equivalent of the Lightning logger setup (reference:
train_nerf.py:901-943): TensorBoard via tensorboardX, W&B in offline
mode when available (the reference also runs wandb offline and syncs
post-hoc), both rate-limit aware via `log_every`.
"""
from __future__ import annotations

import os
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: str, use_wandb: bool = False,
                 wandb_project: str = "ncnerf_tpu", run_name: str = "",
                 config: Optional[dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        try:
            from tensorboardX import SummaryWriter
            self.tb = SummaryWriter(log_dir)
        except Exception:
            self.tb = None
        self.wandb = None
        if use_wandb:
            try:  # pragma: no cover - wandb not in the base image
                import wandb
                os.environ.setdefault("WANDB_MODE", "offline")
                self.wandb = wandb.init(
                    project=wandb_project, name=run_name or None,
                    dir=log_dir, config=config or {})
            except Exception:
                self.wandb = None

    def log_scalars(self, metrics: Dict[str, float], step: int,
                    prefix: str = ""):
        for k, v in metrics.items():
            name = f"{prefix}{k}"
            if self.tb is not None:
                self.tb.add_scalar(name, float(v), step)
        if self.wandb is not None:
            self.wandb.log(
                {f"{prefix}{k}": float(v) for k, v in metrics.items()},
                step=step)

    def log_image(self, name: str, img, step: int):
        if self.tb is not None:
            self.tb.add_image(name, img, step, dataformats="HWC")
        if self.wandb is not None:
            import wandb
            self.wandb.log({name: wandb.Image(img)}, step=step)

    def close(self):
        if self.tb is not None:
            self.tb.close()
        if self.wandb is not None:
            self.wandb.finish()
