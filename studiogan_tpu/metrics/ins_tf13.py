"""Legacy TF1.3 Inception Score (parity note for reference
src/metrics/ins_tf13.py).

The reference keeps a TensorFlow-1.3 IS implementation purely for
historical comparability: the classic "Improved GAN" IS used the 2015
TF inception graph's 1008-way logits.  Our InceptionV3_tf backbone IS
already computes softmax over the SAME TF-ported 1008-way logits
(metrics/inception_v3.py, fc 1008), so this module is a thin alias —
``calculate_is`` produces the TF1.3-semantics score directly.
"""

from __future__ import annotations

import numpy as np

from studiogan_tpu.metrics.ins import calculate_kl_div


def inception_softmax(logits_1008: np.ndarray) -> np.ndarray:
    """Softmax over the TF 1008-way logits (classes 1..1000 used +
    8 unused background slots kept, exactly as TF1.3 did)."""
    x = np.asarray(logits_1008, np.float64)
    x = x - x.max(axis=1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=1, keepdims=True)


def calculate_is(logits_1008: np.ndarray, splits: int = 10) -> tuple[float, float]:
    return calculate_kl_div(inception_softmax(logits_1008), splits)
