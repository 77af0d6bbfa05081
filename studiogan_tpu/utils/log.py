"""Logging (parity with reference src/utils/log.py + the fixed-format
progress line of worker.py:49-56)."""

from __future__ import annotations

import json
import logging
import os
import random
from datetime import datetime


def make_run_name(framework: str, data_name: str, run_prefix: str = "train") -> str:
    """reference log.py:14-18: {data}-{framework}-{prefix}-{timestamp}"""
    now = datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
    return f"{data_name}-{framework}-{run_prefix}-{now}"


def make_logger(save_dir: str, run_name: str, log_output=None) -> logging.Logger:
    """reference log.py:21-44: console + SAVE_DIR/logs/{run_name}.log"""
    logger = logging.getLogger(run_name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if not logger.handlers:
        fmt = logging.Formatter("[%(levelname)s] %(asctime)s > %(message)s",
                                datefmt="%Y-%m-%d %H:%M:%S")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if save_dir is not None:
            os.makedirs(os.path.join(save_dir, "logs"), exist_ok=True)
            fh = logging.FileHandler(
                os.path.join(save_dir, "logs", f"{run_name}.log"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


PROGRESS_FORMAT = ("Step: {step:>6} Progress: {progress:<.3%} Elapsed: {elapsed} "
                   "Gen_loss: {gen_loss:<.4} Dis_loss: {dis_loss:<.4} ")


class StatsWriter:
    """Append-style run statistics (reference misc.py:558-580 .npy dumps)
    as JSONL under SAVE_DIR/statistics/{run_name}/, with optional wandb
    mirroring (reference worker.py:180-184, 706-753)."""

    def __init__(self, save_dir: str, run_name: str, use_wandb: bool = False,
                 wandb_kwargs: dict | None = None):
        self.dir = os.path.join(save_dir, "statistics", run_name)
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, "train_stats.jsonl")
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(name=run_name, **(wandb_kwargs or {}))
            except ImportError:
                pass

    def write(self, step: int, **metrics):
        rec = {"step": step}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in rec.items() if k != "step"},
                            step=step)

    def log_image(self, step: int, images, key: str = "generated_images"):
        """Mirror an image canvas to wandb (reference worker.py:797-798
        logs the fake-image grid alongside the PNG on disk).  images:
        (N,H,W,C) float in [-1,1] or a single HWC uint8 canvas."""
        if self._wandb is None:
            return
        import numpy as np
        x = np.asarray(images)
        if x.dtype != np.uint8:
            x = np.clip((x + 1.0) * 127.5 + 0.5, 0, 255).astype(np.uint8)
        self._wandb.log({key: [self._wandb.Image(im) for im in
                               (x if x.ndim == 4 else [x])]}, step=step)

    def plot_curves(self, out_path: str) -> str | None:
        """Loss/metric curves from the JSONL log (reference misc.py:419-480
        figure PNGs)."""
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return None
        if not os.path.exists(self.path):
            return None
        recs = [json.loads(line) for line in open(self.path)]
        if not recs:
            return None
        keys = [k for k in recs[0] if k != "step"
                and isinstance(recs[0][k], (int, float))]
        steps = [r["step"] for r in recs]
        fig, ax = plt.subplots(figsize=(8, 5))
        for k in keys[:6]:
            vals = [r.get(k) for r in recs]
            if any(v is not None for v in vals):
                ax.plot(steps, vals, label=k)
        ax.set_xlabel("step")
        ax.legend()
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        fig.savefig(out_path)
        plt.close(fig)
        return out_path
