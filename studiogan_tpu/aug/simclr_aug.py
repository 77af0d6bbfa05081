"""SimCLR/BYOL differentiable augmentation stack (capability parity with
reference src/utils/simclr_aug.py — the ContraGAN augment pipeline).

NHWC, explicit rng.  The HSV adjustment uses a straight-through
gradient exactly like the reference's RandomHSVFunction (simclr_aug.py:
182-205, backward = identity).  Deviations for static shapes: the
random-resized-crop samples per-sample scale/ratio directly (the
reference draws N*10 numpy trials and partially fills the batch,
simclr_aug.py:123-149 — same distribution, host-RNG-free).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def rgb2hsv(rgb: Array) -> Array:
    """reference simclr_aug.py:38-67; rgb in [0,1], NHWC."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    rc = (maxc - r) / jnp.maximum(delta, 1e-8)
    gc = (maxc - g) / jnp.maximum(delta, 1e-8)
    bc = (maxc - b) / jnp.maximum(delta, 1e-8)
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def hsv2rgb(hsv: Array) -> Array:
    """reference simclr_aug.py:70-89."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _grid_sample_reflect(img: Array, grid: Array) -> Array:
    """Bilinear grid sample with reflection padding, NHWC."""
    n, h, w, c = img.shape
    gx = ((grid[..., 0] + 1) * w - 1) / 2
    gy = ((grid[..., 1] + 1) * h - 1) / 2

    def reflect(x, size):
        # reflect around [-0.5, size-0.5]
        x = jnp.abs(x)
        period = 2 * size - 2
        x = x % jnp.maximum(period, 1)
        return jnp.where(x >= size, period - x, x)

    def gather(yy, xx):
        xc = jnp.clip(reflect(xx, w), 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(reflect(yy, h), 0, h - 1).astype(jnp.int32)
        return jax.vmap(lambda im, ys, xs: im[ys, xs])(img, yc, xc)

    x0, y0 = jnp.floor(gx), jnp.floor(gy)
    wx, wy = gx - x0, gy - y0
    v00, v01 = gather(y0, x0), gather(y0, x0 + 1)
    v10, v11 = gather(y0 + 1, x0), gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def random_resize_crop(rng: Array, x: Array, scale=(0.2, 1.0),
                       ratio=(3 / 4, 4 / 3)) -> Array:
    """Inception-style crop via affine resample (reference :104-154)."""
    n, h, w, _ = x.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    area = jax.random.uniform(k1, (n,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(k2, (n,), minval=math.log(ratio[0]),
                               maxval=math.log(ratio[1]))
    ar = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * ar), 0.05, 1.0)
    ch = jnp.clip(jnp.sqrt(area / ar), 0.05, 1.0)
    bx = jax.random.uniform(k3, (n,), minval=-1.0, maxval=1.0) * (1 - cw)
    by = jax.random.uniform(k4, (n,), minval=-1.0, maxval=1.0) * (1 - ch)

    ux = (2 * jnp.arange(w) + 1) / w - 1
    uy = (2 * jnp.arange(h) + 1) / h - 1
    gx = cw[:, None, None] * ux[None, None, :] + bx[:, None, None]
    gy = ch[:, None, None] * uy[None, :, None] + by[:, None, None]
    grid = jnp.stack([jnp.broadcast_to(gx, (n, h, w)),
                      jnp.broadcast_to(gy, (n, h, w))], axis=-1)
    return _grid_sample_reflect(x, grid)


def horizontal_flip(rng: Array, x: Array) -> Array:
    flip = jax.random.uniform(rng, (x.shape[0], 1, 1, 1)) < 0.5
    return jnp.where(flip, jnp.flip(x, axis=2), x)


def adjust_contrast(rng: Array, x: Array, rng_range) -> Array:
    factor = jax.random.uniform(rng, (x.shape[0], 1, 1, 1),
                                minval=rng_range[0], maxval=rng_range[1])
    means = jnp.mean(x, axis=(1, 2), keepdims=True)
    return jnp.clip((x - means) * factor + means, 0, 1)


def adjust_hsv(rng: Array, x: Array, hue, sat, bright) -> Array:
    """Straight-through HSV jitter (reference :182-205, :242-254)."""
    n = x.shape[0]
    k1, k2, k3 = jax.random.split(rng, 3)
    f_h = jax.random.uniform(k1, (n, 1, 1, 1), minval=hue[0], maxval=hue[1])
    f_s = jax.random.uniform(k2, (n, 1, 1, 1), minval=sat[0], maxval=sat[1])
    f_v = jax.random.uniform(k3, (n, 1, 1, 1), minval=bright[0], maxval=bright[1])

    def hsv_fn(t):
        hsv = rgb2hsv(jnp.clip(t, 0, 1))
        hch = (hsv[..., 0:1] + f_h * 255.0 / 360.0) % 1.0
        sch = jnp.clip(hsv[..., 1:2] * f_s, 0, 1)
        vch = jnp.clip(hsv[..., 2:3] * f_v, 0, 1)
        return hsv2rgb(jnp.concatenate([hch, sch, vch], axis=-1))

    return x + jax.lax.stop_gradient(hsv_fn(x) - x)  # straight-through


def color_gray(x: Array) -> Array:
    l = (x[..., 0:1] * 0.299 + x[..., 1:2] * 0.587 + x[..., 2:3] * 0.114)
    return jnp.concatenate([l, l, l], axis=-1)


def gaussian_blur(rng: Array, x: Array, sigma_range=(0.1, 2.0)) -> Array:
    n, h, w, c = x.shape
    radius = max((h // 10) // 2, 1)
    ksize = radius * 2 + 1
    sigma = jax.random.uniform(rng, (), minval=sigma_range[0],
                               maxval=sigma_range[1])
    coords = jnp.arange(ksize) - radius
    k1d = jnp.exp(-(coords ** 2) / (2 * sigma ** 2))
    k1d = k1d / k1d.sum()
    pad = radius
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    kv = jnp.tile(k1d[:, None, None, None], (1, 1, 1, c))
    kh = jnp.tile(k1d[None, :, None, None], (1, 1, 1, c))
    y = jax.lax.conv_general_dilated(xp, kv, (1, 1), "VALID",
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                     feature_group_count=c)
    return jax.lax.conv_general_dilated(y, kh, (1, 1), "VALID",
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                        feature_group_count=c)


def cutout(rng: Array, x: Array, length: int = 15) -> Array:
    n, h, w, _ = x.shape
    k1, k2 = jax.random.split(rng)
    hc = jax.random.randint(k1, (n, 1), 0, h)
    wc = jax.random.randint(k2, (n, 1), 0, w)
    half = (length - 1) // 2
    in_h = jnp.abs(jnp.arange(h)[None, :] - hc) <= half
    in_w = jnp.abs(jnp.arange(w)[None, :] - wc) <= half
    mask = 1.0 - (in_h[:, :, None] & in_w[:, None, :]).astype(x.dtype)
    return x * mask[..., None]


def _random_apply(rng: Array, fn, x: Array, p: float) -> Array:
    k1, k2 = jax.random.split(rng)
    apply = jax.random.uniform(k1) < p  # whole-batch gate (reference :92-101)
    return jnp.where(apply, fn(k2, x), x)


class SimclrAugment:
    """Callable (rng, x NHWC) -> x.  Pipelines per reference :339-358."""

    def __init__(self, aug_type: str):
        self.aug_type = aug_type
        assert aug_type in ("simclr_basic", "simclr_hq", "simclr_hq_cutout",
                            "byol")
        self.sat = (0.6, 1.4) if aug_type != "byol" else (0.8, 1.2)

    def __call__(self, rng: Array, x: Array) -> Array:
        ks = jax.random.split(rng, 8)
        x = random_resize_crop(ks[0], x)
        x = horizontal_flip(ks[1], x)

        def jitter(k, t):
            k1, k2, k3 = jax.random.split(k, 3)
            order = jax.random.uniform(k1) > 0.5
            c = lambda kk, tt: adjust_contrast(kk, tt, (0.6, 1.4))  # noqa: E731
            hsvf = lambda kk, tt: adjust_hsv(  # noqa: E731
                kk, tt, hue=(-0.1, 0.1), sat=self.sat, bright=(0.6, 1.4))
            a = c(k2, hsvf(k3, t))
            b = hsvf(k3, c(k2, t))
            return jnp.where(order, a, b)

        x = _random_apply(ks[2], jitter, x, 0.8)
        x = _random_apply(ks[3], lambda k, t: color_gray(t), x, 0.2)
        if self.aug_type in ("simclr_hq", "simclr_hq_cutout", "byol"):
            x = _random_apply(ks[4], gaussian_blur, x, 0.5)
        if self.aug_type == "simclr_hq_cutout":
            x = _random_apply(ks[5], cutout, x, 0.5)
        return x
