"""DiffAugment (parity with reference src/utils/diffaug.py, NHWC).

All ops are differentiable w.r.t. x; randomness comes from the explicit
rng.  Gather-based translation/cutout vectorize as one-hot matmuls /
mask products — TPU-friendly, no scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def rand_brightness(rng: Array, x: Array) -> Array:
    return x + (jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype) - 0.5)


def rand_saturation(rng: Array, x: Array) -> Array:
    x_mean = x.mean(axis=3, keepdims=True)
    r = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype) * 2
    return (x - x_mean) * r + x_mean


def rand_contrast(rng: Array, x: Array) -> Array:
    x_mean = x.mean(axis=(1, 2, 3), keepdims=True)
    r = jax.random.uniform(rng, (x.shape[0], 1, 1, 1), x.dtype) + 0.5
    return (x - x_mean) * r + x_mean


def rand_translation(rng: Array, x: Array, ratio: float = 0.125) -> Array:
    """Zero-padded random shift per sample (reference diffaug.py:66-80)."""
    n, h, w, c = x.shape
    sh, sw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    kh, kw = jax.random.split(rng)
    tx = jax.random.randint(kh, (n,), -sh, sh + 1)
    ty = jax.random.randint(kw, (n,), -sw, sw + 1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    rows = jnp.clip(jnp.arange(h)[None, :] + tx[:, None] + 1, 0, h + 1)  # (n,h)
    cols = jnp.clip(jnp.arange(w)[None, :] + ty[:, None] + 1, 0, w + 1)  # (n,w)

    def gather_one(img, r, cc):
        return img[r][:, cc]

    return jax.vmap(gather_one)(xp, rows, cols)


def rand_cutout(rng: Array, x: Array, ratio: float = 0.5) -> Array:
    """Zero square mask at random offset (reference diffaug.py:83-98).

    The torch version scatters zeros at clipped index sets; here the
    mask is the outer product of per-axis membership tests (clipping at
    the border collapses indices exactly like the reference's clamp)."""
    n, h, w, _ = x.shape
    ch, cw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    kh, kw = jax.random.split(rng)
    ox = jax.random.randint(kh, (n, 1), 0, h + (1 - ch % 2))
    oy = jax.random.randint(kw, (n, 1), 0, w + (1 - cw % 2))
    gx = jnp.clip(jnp.arange(ch)[None, :] + ox - ch // 2, 0, h - 1)  # (n,ch)
    gy = jnp.clip(jnp.arange(cw)[None, :] + oy - cw // 2, 0, w - 1)  # (n,cw)
    in_x = (jnp.arange(h)[None, :, None] == gx[:, None, :]).any(-1)  # (n,h)
    in_y = (jnp.arange(w)[None, :, None] == gy[:, None, :]).any(-1)  # (n,w)
    mask = 1.0 - (in_x[:, :, None] & in_y[:, None, :]).astype(x.dtype)
    return x * mask[..., None]


def apply_diffaug(rng: Array, x: Array,
                  policy: str = "color,translation,cutout") -> Array:
    fns = {
        "color": [rand_brightness, rand_saturation, rand_contrast],
        "translation": [rand_translation],
        "cutout": [rand_cutout],
    }
    for pol in policy.split(","):
        for f in fns[pol]:
            rng, k = jax.random.split(rng)
            x = f(k, x)
    return x
