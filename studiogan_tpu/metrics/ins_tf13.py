"""Legacy TF1.3 Inception Score (parity with reference
src/metrics/ins_tf13.py, the Improved-GAN script kept for historical
score comparability).

The TF1.3 pipeline differs from the modern one in three measurable ways
(reference ins_tf13.py:44-120):

  1. input resize uses TF1.x ``ResizeBilinear`` semantics — the
     *asymmetric* coordinate map ``src = dst * in/out`` (no half-pixel
     centers, no anti-aliasing), applied inside the graph to whatever
     resolution the samples have;
  2. normalization is the 2015 graph's ``(x - 128) / 128``;
  3. logits are the **bias-free** ``matmul(pool3, W)`` over all 1008
     outputs (reference ins_tf13.py:115-117 takes only the MatMul weight
     input, dropping the bias), then softmax → the classic
     exp(mean KL) with splits.

The 2015 'pt_inception' weights used by our InceptionV3_tf backbone are
the FID port of the very same ``classify_image_graph_def.pb``, so pool3
features are the correct inputs here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from studiogan_tpu.metrics.ins import calculate_kl_div


def tf1_resize_bilinear(x: jax.Array, size: int) -> jax.Array:
    """TF1.x ResizeBilinear (align_corners=False, half_pixel_centers=False):
    src = dst * (in / out); border clamped.  x: NHWC float."""
    n, h, w, c = x.shape

    def axis_weights(in_dim):
        src = jnp.arange(size, dtype=jnp.float32) * (in_dim / size)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_dim - 1)
        frac = src - lo.astype(jnp.float32)
        return lo, hi, frac

    ylo, yhi, yf = axis_weights(h)
    xlo, xhi, xf = axis_weights(w)
    top = x[:, ylo][:, :, xlo] * (1 - xf)[None, None, :, None] \
        + x[:, ylo][:, :, xhi] * xf[None, None, :, None]
    bot = x[:, yhi][:, :, xlo] * (1 - xf)[None, None, :, None] \
        + x[:, yhi][:, :, xhi] * xf[None, None, :, None]
    return top * (1 - yf)[None, :, None, None] + bot * (yf)[None, :, None, None]


class TF13InceptionScorer:
    """Batched TF1.3-semantics IS over uint8 [0,255] HWC images."""

    def __init__(self, batch_size: int = 64):
        from studiogan_tpu.metrics.preparation import (_INCEPTION_FILES,
                                                       _find_weights)
        from studiogan_tpu.metrics.inception_v3 import (InceptionV3,
                                                        load_weights)
        self.batch_size = batch_size
        model = InceptionV3()
        path = _find_weights(_INCEPTION_FILES)
        self.random_weights = path is None
        if path:
            variables = load_weights(path)
        else:
            import warnings
            warnings.warn("pt_inception weights not found; TF1.3 IS runs on "
                          "RANDOM weights — scores are NOT comparable.")
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 299, 299, 3)))
        fc_w = variables["params"]["fc"]["kernel"]  # (2048, 1008)

        @jax.jit
        def forward(imgs_255):  # NHWC float [0,255]
            x = tf1_resize_bilinear(imgs_255, 299)
            x = (x - 128.0) / 128.0
            feats, _ = model.apply(variables, x)
            logits = feats @ fc_w  # TF1.3: no bias (ins_tf13.py:115-117)
            return jax.nn.softmax(logits, axis=-1)

        self._forward = forward

    def predict(self, images: np.ndarray) -> np.ndarray:
        """images: (N,H,W,3) uint8-range.  Returns (N,1008) softmax probs."""
        images = np.asarray(images, np.float32)
        probs = []
        for i in range(0, len(images), self.batch_size):
            probs.append(np.asarray(
                self._forward(jnp.asarray(images[i:i + self.batch_size]))))
        return np.concatenate(probs, axis=0)

    def score(self, images: np.ndarray, splits: int = 10) -> tuple[float, float]:
        return calculate_kl_div(self.predict(images), splits)


def calculate_is_tf13(images: np.ndarray, splits: int = 10,
                      batch_size: int = 64) -> tuple[float, float]:
    """One-shot helper matching the reference run() semantics
    (reference ins_tf13.py:45-76): images in [0,255]."""
    return TF13InceptionScorer(batch_size).score(images, splits)


def inception_softmax(logits_1008: np.ndarray) -> np.ndarray:
    """Softmax over the TF 1008-way logits (kept for callers of the old
    alias API)."""
    x = np.asarray(logits_1008, np.float64)
    x = x - x.max(axis=1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=1, keepdims=True)


def calculate_is(logits_1008: np.ndarray, splits: int = 10) -> tuple[float, float]:
    return calculate_kl_div(inception_softmax(logits_1008), splits)
