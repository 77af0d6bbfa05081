"""Consistency-regularization augment: flip + reflect-padded translation
(parity with reference src/utils/cr.py, NHWC)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def random_flip(rng: Array, x: Array, p: float = 0.5) -> Array:
    """Per-sample horizontal flip (reference cr.py:23-31)."""
    flip = jax.random.uniform(rng, (x.shape[0], 1, 1, 1)) < p
    return jnp.where(flip, jnp.flip(x, axis=2), x)


def random_translation(rng: Array, x: Array, ratio: float = 1 / 8) -> Array:
    """Reflect-padded random shift (reference cr.py:34-48)."""
    n, h, w, _ = x.shape
    mx, my = int(h * ratio), int(w * ratio)
    kh, kw = jax.random.split(rng)
    tx = jax.random.randint(kh, (n,), -mx, mx + 1)
    ty = jax.random.randint(kw, (n,), -my, my + 1)
    xp = jnp.pad(x, ((0, 0), (mx, mx), (my, my), (0, 0)), mode="reflect")
    rows = jnp.arange(h)[None, :] + tx[:, None] + mx  # (n,h)
    cols = jnp.arange(w)[None, :] + ty[:, None] + my  # (n,w)

    def gather_one(img, r, c):
        return img[r][:, c]

    return jax.vmap(gather_one)(xp, rows, cols)


def apply_cr_aug(rng: Array, x: Array, flip: bool = True,
                 translation: bool = True) -> Array:
    k1, k2 = jax.random.split(rng)
    if flip:
        x = random_flip(k1, x, 0.5)
    if translation:
        x = random_translation(k2, x, 1 / 8)
    return x
