"""Inception Score (parity with reference src/metrics/ins.py)."""

from __future__ import annotations

import numpy as np


def calculate_kl_div(ps: np.ndarray, splits: int) -> tuple[float, float]:
    """reference ins.py:28-42: IS over `splits` chunks."""
    ps = np.asarray(ps, dtype=np.float64)
    n = ps.shape[0]
    scores = []
    for i in range(splits):
        part = ps[(i * n) // splits:((i + 1) * n) // splits]
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(py + 1e-12))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def eval_features(probs: np.ndarray, labels: np.ndarray | None, splits: int,
                  is_acc: bool = False,
                  label_remap: np.ndarray | None = None):
    """reference ins.py:45-79: IS + optional top1/top5 vs true labels."""
    is_score, is_std = calculate_kl_div(probs, splits)
    top1 = top5 = "N/A"
    if is_acc and labels is not None:
        pred = probs if label_remap is None else probs[:, label_remap]
        order = np.argsort(-pred, axis=1)
        top1 = float(np.mean(order[:, 0] == labels))
        top5 = float(np.mean((order[:, :5] == labels[:, None]).any(axis=1)))
    return is_score, is_std, top1, top5
