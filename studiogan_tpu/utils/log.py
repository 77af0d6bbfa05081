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
    as JSONL under SAVE_DIR/statistics/{run_name}/."""

    def __init__(self, save_dir: str, run_name: str):
        self.dir = os.path.join(save_dir, "statistics", run_name)
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, "train_stats.jsonl")

    def write(self, step: int, **metrics):
        rec = {"step": step}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
