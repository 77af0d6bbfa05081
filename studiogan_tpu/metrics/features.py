"""Feature stacking (parity with reference src/metrics/features.py).

Under GSPMD the reference's GatherLayer all_gathers (features.py:61-64)
are unnecessary: generation + backbone forward run as one sharded
program and features land replicated on host.
"""

from __future__ import annotations

import math

import jax
import numpy as np


def generate_images_and_stack_features(engine, state, eval_model,
                                       num_generate: int, batch_size: int,
                                       rng, quantize: bool = True,
                                       override_g_state=None):
    """reference features.py:17-65: loop G -> backbone, stack feats/probs."""
    feats, probs, labels = [], [], []
    n_batches = math.ceil(num_generate / batch_size)
    for i in range(n_batches):
        rng, k = jax.random.split(rng)
        imgs, labs = engine.generate(
            state, k, batch_size,
            truncation_factor=engine.cfg.RUN.truncation_factor,
            override_g_state=override_g_state)
        f, logit = eval_model.get_outputs(np.asarray(jax.device_get(imgs)),
                                          quantize=quantize)
        feats.append(f)
        probs.append(_softmax(logit))
        labels.append(np.asarray(jax.device_get(labs)))
    feats = np.concatenate(feats)[:num_generate]
    probs = np.concatenate(probs)[:num_generate]
    labels = np.concatenate(labels)[:num_generate]
    return feats, probs, labels


def sample_images_from_loader_and_stack_features(dataset, eval_model,
                                                 num_feats: int,
                                                 batch_size: int):
    """reference features.py:68-104 / stack_features:107-142: real-data
    features straight from a dataset (uint8 HWC)."""
    feats, probs, labels = [], [], []
    n = min(num_feats, len(dataset))
    for start in range(0, n, batch_size):
        idx = range(start, min(start + batch_size, n))
        batch = np.stack([dataset[i][0] for i in idx])
        labs = np.asarray([dataset[i][1] for i in idx])
        f, logit = eval_model.get_outputs(batch, quantize=False)
        feats.append(f)
        probs.append(_softmax(logit))
        labels.append(labs)
    return np.concatenate(feats), np.concatenate(probs), np.concatenate(labels)


def _softmax(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    x = x - x.max(axis=1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=1, keepdims=True)
