"""Adaptive Discriminator Augmentation pipeline (capability parity with
reference src/utils/ada_aug.py, the NVIDIA augment.py).

Matrix-composed homographies (blit + geometric), color-space 4x4
transforms, wavelet filter-bank amplification, noise, cutout — all
differentiable, driven by one probability scalar ``p``.

TPU-native deviations (semantics preserved, shapes made static for XLA):
  * the reflect padding before the geometric warp uses the worst-case
    static margin (the reference computes a data-dependent margin and
    clamps it to width-1; we always pad to that clamp bound so the
    compiled program has one shape);
  * grid_sample is an explicit bilinear gather (zeros padding,
    align_corners=False) — JAX differentiates it natively, replacing
    grid_sample_gradfix (reference style_ops/grid_sample_gradfix.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from studiogan_tpu.ops.upfirdn2d import downsample2d, setup_filter, upsample2d

Array = jax.Array

# standard wavelet coefficients (public constants; reference ada_aug.py:20-40)
WAVELETS = {
    "haar": [0.7071067811865476, 0.7071067811865476],
    "sym2": [-0.12940952255092145, 0.22414386804185735,
             0.836516303737469, 0.48296291314469025],
    "sym6": [0.015404109327027373, 0.0034907120842174702,
             -0.11799011114819057, -0.048311742585633, 0.4910559419267466,
             0.787641141030194, 0.3379294217276218, -0.07263752278646252,
             -0.021060292512300564, 0.04472490177066578,
             0.0017677118642428036, -0.007800708325034148],
}


def _eye3(b):
    return jnp.broadcast_to(jnp.eye(3), (b, 3, 3))


def _translate2d(tx, ty):
    b = tx.shape[0]
    m = _eye3(b)
    m = m.at[:, 0, 2].set(tx)
    return m.at[:, 1, 2].set(ty)


def _scale2d(sx, sy):
    b = sx.shape[0] if hasattr(sx, "shape") and getattr(sx, "ndim", 0) else 1
    sx = jnp.broadcast_to(jnp.asarray(sx, jnp.float32), (b,))
    sy = jnp.broadcast_to(jnp.asarray(sy, jnp.float32), (b,))
    m = _eye3(b)
    m = m.at[:, 0, 0].set(sx)
    return m.at[:, 1, 1].set(sy)


def _rotate2d(theta):
    b = theta.shape[0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    m = _eye3(b)
    m = m.at[:, 0, 0].set(c).at[:, 0, 1].set(-s)
    return m.at[:, 1, 0].set(s).at[:, 1, 1].set(c)


def _grid_sample_bilinear(img: Array, grid: Array) -> Array:
    """torch grid_sample(bilinear, zeros, align_corners=False), NHWC.
    grid: (N, Ho, Wo, 2) normalized xy in [-1, 1]."""
    n, h, w, c = img.shape
    gx = ((grid[..., 0] + 1) * w - 1) / 2
    gy = ((grid[..., 1] + 1) * h - 1) / 2
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(yy, xx):
        inside = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        vals = jax.vmap(lambda im, ys, xs: im[ys, xs])(img, yc, xc)  # (N,Ho,Wo,C)
        return vals * inside[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1 - wx)[..., None] + v11 * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def _grid_sample_bilinear_folded(img: Array, grid_x: Array, grid_y: Array,
                                 c: int) -> Array:
    """Same sampling as :func:`_grid_sample_bilinear` on a channels-folded
    (N*C, H, W) image, with the normalized grid given as separate
    (N, Ho, Wo) x/y planes broadcast over each sample's C channels."""
    nc, h, w = img.shape
    gx = ((grid_x + 1) * w - 1) / 2
    gy = ((grid_y + 1) * h - 1) / 2
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = jnp.repeat(gx - x0, c, axis=0)                       # (N*C, Ho, Wo)
    wy = jnp.repeat(gy - y0, c, axis=0)
    x0 = jnp.repeat(x0, c, axis=0)
    y0 = jnp.repeat(y0, c, axis=0)

    def gather(yy, xx):
        inside = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        vals = jax.vmap(lambda im, ys, xs: im[ys, xs])(img, yc, xc)
        return vals * inside

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


class AdaAugment:
    """Callable: (rng, images NHWC in [-1,1], p) -> images."""

    PRESETS = {  # reference config.py:568-580 ada_augpipe
        "blit": dict(xflip=1, rotate90=1, xint=1),
        "geom": dict(scale=1, rotate=1, aniso=1, xfrac=1),
        "color": dict(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1),
        "filter": dict(imgfilter=1),
        "noise": dict(noise=1),
        "cutout": dict(cutout=1),
        "bg": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1, xfrac=1),
        "bgc": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                    xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                    saturation=1),
        "bgcf": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                     xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                     saturation=1, imgfilter=1),
        "bgcfn": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                      xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                      saturation=1, imgfilter=1, noise=1),
        "bgcfnc": dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                       xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                       saturation=1, imgfilter=1, noise=1, cutout=1),
    }

    def __init__(self, xflip=0, rotate90=0, xint=0, xint_max=0.125,
                 scale=0, rotate=0, aniso=0, xfrac=0, scale_std=0.2,
                 rotate_max=1, aniso_std=0.2, xfrac_std=0.125,
                 brightness=0, contrast=0, lumaflip=0, hue=0, saturation=0,
                 brightness_std=0.2, contrast_std=0.5, hue_max=1,
                 saturation_std=1, imgfilter=0, imgfilter_bands=(1, 1, 1, 1),
                 imgfilter_std=1, noise=0, cutout=0, noise_std=0.1,
                 cutout_size=0.5):
        self.__dict__.update({k: float(v) if not isinstance(v, (tuple, list))
                              else list(v) for k, v in locals().items()
                              if k != "self"})
        self.Hz_geom = setup_filter(WAVELETS["sym6"])
        # band-pass filter bank (reference ada_aug.py:167-177)
        import scipy.signal
        Hz_lo = np.asarray(WAVELETS["sym2"])
        Hz_hi = Hz_lo * ((-1) ** np.arange(Hz_lo.size))
        Hz_lo2 = np.convolve(Hz_lo, Hz_lo[::-1]) / 2
        Hz_hi2 = np.convolve(Hz_hi, Hz_hi[::-1]) / 2
        Hz_fbank = np.eye(4, 1)
        for i in range(1, Hz_fbank.shape[0]):
            Hz_fbank = np.dstack([Hz_fbank, np.zeros_like(Hz_fbank)]
                                 ).reshape(Hz_fbank.shape[0], -1)[:, :-1]
            Hz_fbank = scipy.signal.convolve(Hz_fbank, [Hz_lo2])
            lo = (Hz_fbank.shape[1] - Hz_hi2.size) // 2
            Hz_fbank[i, lo:lo + Hz_hi2.size] += Hz_hi2
        self.Hz_fbank = Hz_fbank.astype(np.float32)

    @classmethod
    def from_preset(cls, name: str) -> "AdaAugment":
        return cls(**cls.PRESETS[name])

    # -- main ---------------------------------------------------------------

    def __call__(self, rng: Array, images: Array, p) -> Array:
        n, h, w, c = images.shape
        p = jnp.asarray(p, jnp.float32)
        keys = iter(jax.random.split(rng, 40))
        nk = lambda: next(keys)  # noqa: E731

        # ---- pixel blitting + geometric: build G_inv (3x3 per sample) ----
        G_inv = _eye3(n)
        use_geom = False
        if self.xflip > 0:
            use_geom = True
            i = jnp.floor(jax.random.uniform(nk(), (n,)) * 2)
            i = jnp.where(jax.random.uniform(nk(), (n,)) < self.xflip * p, i, 0.0)
            G_inv = G_inv @ _scale2d(1 - 2 * i, jnp.ones((n,)))
        if self.rotate90 > 0:
            use_geom = True
            i = jnp.floor(jax.random.uniform(nk(), (n,)) * 4)
            i = jnp.where(jax.random.uniform(nk(), (n,)) < self.rotate90 * p, i, 0.0)
            G_inv = G_inv @ _rotate2d(math.pi / 2 * i)  # inv of -pi/2*i
        if self.xint > 0:
            use_geom = True
            t = (jax.random.uniform(nk(), (n, 2)) * 2 - 1) * self.xint_max
            t = jnp.where(jax.random.uniform(nk(), (n, 1)) < self.xint * p, t, 0.0)
            G_inv = G_inv @ _translate2d(-jnp.round(t[:, 0] * w),
                                         -jnp.round(t[:, 1] * h))
        if self.scale > 0:
            use_geom = True
            s = jnp.exp2(jax.random.normal(nk(), (n,)) * self.scale_std)
            s = jnp.where(jax.random.uniform(nk(), (n,)) < self.scale * p, s, 1.0)
            G_inv = G_inv @ _scale2d(1 / s, 1 / s)
        p_rot = 1 - jnp.sqrt(jnp.clip(1 - self.rotate * p, 0, 1))
        if self.rotate > 0:
            use_geom = True
            theta = (jax.random.uniform(nk(), (n,)) * 2 - 1) * math.pi * self.rotate_max
            theta = jnp.where(jax.random.uniform(nk(), (n,)) < p_rot, theta, 0.0)
            G_inv = G_inv @ _rotate2d(theta)  # inv of -theta
        if self.aniso > 0:
            use_geom = True
            s = jnp.exp2(jax.random.normal(nk(), (n,)) * self.aniso_std)
            s = jnp.where(jax.random.uniform(nk(), (n,)) < self.aniso * p, s, 1.0)
            G_inv = G_inv @ _scale2d(1 / s, s)
        if self.rotate > 0:
            theta = (jax.random.uniform(nk(), (n,)) * 2 - 1) * math.pi * self.rotate_max
            theta = jnp.where(jax.random.uniform(nk(), (n,)) < p_rot, theta, 0.0)
            G_inv = G_inv @ _rotate2d(theta)
        if self.xfrac > 0:
            use_geom = True
            t = jax.random.normal(nk(), (n, 2)) * self.xfrac_std
            t = jnp.where(jax.random.uniform(nk(), (n, 1)) < self.xfrac * p, t, 0.0)
            G_inv = G_inv @ _translate2d(-t[:, 0] * w, -t[:, 1] * h)

        if use_geom:
            images = self._execute_geom(images, G_inv)

        # ---- color transforms: 4x4 C matrix ----
        C = jnp.broadcast_to(jnp.eye(4), (n, 4, 4))
        use_color = False
        if self.brightness > 0:
            use_color = True
            b = jax.random.normal(nk(), (n,)) * self.brightness_std
            b = jnp.where(jax.random.uniform(nk(), (n,)) < self.brightness * p, b, 0.0)
            T = jnp.broadcast_to(jnp.eye(4), (n, 4, 4))
            T = T.at[:, 0, 3].set(b).at[:, 1, 3].set(b).at[:, 2, 3].set(b)
            C = T @ C
        if self.contrast > 0:
            use_color = True
            cs = jnp.exp2(jax.random.normal(nk(), (n,)) * self.contrast_std)
            cs = jnp.where(jax.random.uniform(nk(), (n,)) < self.contrast * p, cs, 1.0)
            S = jnp.broadcast_to(jnp.eye(4), (n, 4, 4))
            S = S.at[:, 0, 0].set(cs).at[:, 1, 1].set(cs).at[:, 2, 2].set(cs)
            C = S @ C
        v = jnp.asarray([1, 1, 1, 0], jnp.float32) / math.sqrt(3)
        vv = jnp.outer(v, v)
        if self.lumaflip > 0:
            use_color = True
            i = jnp.floor(jax.random.uniform(nk(), (n, 1, 1)) * 2)
            i = jnp.where(jax.random.uniform(nk(), (n, 1, 1)) < self.lumaflip * p, i, 0.0)
            C = (jnp.eye(4) - 2 * vv * i) @ C
        if self.hue > 0 and c > 1:
            use_color = True
            theta = (jax.random.uniform(nk(), (n,)) * 2 - 1) * math.pi * self.hue_max
            theta = jnp.where(jax.random.uniform(nk(), (n,)) < self.hue * p, theta, 0.0)
            C = _rotate3d_about(v[:3], theta) @ C
        if self.saturation > 0 and c > 1:
            use_color = True
            s = jnp.exp2(jax.random.normal(nk(), (n, 1, 1)) * self.saturation_std)
            s = jnp.where(jax.random.uniform(nk(), (n, 1, 1)) < self.saturation * p, s, 1.0)
            C = (vv + (jnp.eye(4) - vv) * s) @ C

        if use_color:
            flat = images.reshape(n, h * w, c)
            if c == 3:
                flat = jnp.einsum("nij,npj->npi", C[:, :3, :3], flat) + \
                    C[:, None, :3, 3][:, 0][:, None, :]
            elif c == 1:
                Cm = jnp.mean(C[:, :3, :], axis=1, keepdims=True)
                flat = flat * jnp.sum(Cm[:, :, :3], axis=2)[:, :, None] + Cm[:, :, 3:]
            images = flat.reshape(n, h, w, c)

        # ---- image-space filtering (wavelet band amplification) ----
        if self.imgfilter > 0:
            images = self._imgfilter(nk(), images, p)

        # ---- corruptions ----
        if self.noise > 0:
            sigma = jnp.abs(jax.random.normal(nk(), (n, 1, 1, 1))) * self.noise_std
            sigma = jnp.where(jax.random.uniform(nk(), (n, 1, 1, 1)) < self.noise * p,
                              sigma, 0.0)
            images = images + jax.random.normal(nk(), images.shape) * sigma
        if self.cutout > 0:
            size = jnp.full((n, 2), self.cutout_size)
            size = jnp.where(jax.random.uniform(nk(), (n, 1)) < self.cutout * p,
                             size, 0.0)
            center = jax.random.uniform(nk(), (n, 2))
            cx = (jnp.arange(w) + 0.5) / w
            cy = (jnp.arange(h) + 0.5) / h
            mask_x = jnp.abs(cx[None, None, :] - center[:, 0, None, None]) \
                >= size[:, 0, None, None] / 2
            mask_y = jnp.abs(cy[None, :, None] - center[:, 1, None, None]) \
                >= size[:, 1, None, None] / 2
            images = images * (mask_x | mask_y).astype(images.dtype)[..., None]
        return images

    # -- helpers -------------------------------------------------------------

    def _execute_geom(self, images: Array, G_inv: Array) -> Array:
        """Pad-reflect, 2x upsample, warp, 2x downsample + crop
        (reference ada_aug.py:268-296), with a static worst-case margin.

        TPU layout note: the whole section runs in a channels-folded
        (N*C, H, W) 3-D layout so the lane-tiled minormost dim is W.
        In NHWC the C=3 canvas tensors land on a (sublane, lane) tile
        and pad 3 -> 128 lanes: at 512px the (N, 3068, 3068, 3) f32
        upsampled canvas inflates ~21x to 19.3 GB (observed HBM OOM at
        AFHQ-512 bs8); folded it is ~900 MB.  The math per channel is
        identical — the warp grid is sample-wise and broadcast over C.
        """
        n, h, w, c = images.shape
        hz_pad = self.Hz_geom.shape[0] // 4
        # static margin = the reference's clamp bound (width-1 / height-1)
        mx = w - 1
        my = h - 1
        x = images.transpose(0, 3, 1, 2).reshape(n * c, h, w)
        x = jnp.pad(x, ((0, 0), (my, my), (mx, mx)), mode="reflect")
        # margin symmetric -> no origin shift needed (reference adjusts by
        # (mx0-mx1)/2 which is 0 here)

        x = upsample2d(x, self.Hz_geom, up=2)
        s2 = _scale2d(jnp.full((n,), 2.0), jnp.full((n,), 2.0))
        s2_inv = _scale2d(jnp.full((n,), 0.5), jnp.full((n,), 0.5))
        t_half = _translate2d(jnp.full((n,), -0.5), jnp.full((n,), -0.5))
        t_half_inv = _translate2d(jnp.full((n,), 0.5), jnp.full((n,), 0.5))
        G = s2 @ G_inv @ s2_inv
        G = t_half @ G @ t_half_inv

        in_h, in_w = x.shape[1], x.shape[2]
        out_h, out_w = (h + hz_pad * 2) * 2, (w + hz_pad * 2) * 2
        sa = _scale2d(jnp.full((n,), 2 / in_w), jnp.full((n,), 2 / in_h))
        sb = _scale2d(jnp.full((n,), out_w / 2), jnp.full((n,), out_h / 2))
        G = sa @ G @ sb

        # affine_grid(align_corners=False): normalized output coords.
        # The x/y planes stay SEPARATE (N, Ho, Wo) arrays — a stacked
        # (..., 2) grid would itself lane-pad 2 -> 128.
        ux = ((2 * jnp.arange(out_w) + 1) / out_w - 1)
        uy = ((2 * jnp.arange(out_h) + 1) / out_h - 1)
        gx = jnp.broadcast_to(ux[None, :], (out_h, out_w))
        gy = jnp.broadcast_to(uy[:, None], (out_h, out_w))
        b = lambda v: v[:, None, None]                                # noqa: E731
        grid_x = b(G[:, 0, 0]) * gx + b(G[:, 0, 1]) * gy + b(G[:, 0, 2])
        grid_y = b(G[:, 1, 0]) * gx + b(G[:, 1, 1]) * gy + b(G[:, 1, 2])
        x = _grid_sample_bilinear_folded(x, grid_x, grid_y, c)

        # the warp's output canvas is already the final size (+ filter
        # padding); the FIR downsample's negative padding crops it off
        x = downsample2d(x, self.Hz_geom, down=2,
                         padding=-hz_pad * 2, flip_filter=True)
        assert x.shape[1:] == (h, w), x.shape
        return x.reshape(n, c, h, w).transpose(0, 2, 3, 1)

    def _imgfilter(self, rng: Array, images: Array, p) -> Array:
        n, h, w, c = images.shape
        num_bands = self.Hz_fbank.shape[0]
        expected_power = jnp.asarray([10, 1, 1, 1], jnp.float32) / 13
        g = jnp.ones((n, num_bands))
        keys = jax.random.split(rng, num_bands * 2)
        for i, band_strength in enumerate(self.imgfilter_bands):
            t_i = jnp.exp2(jax.random.normal(keys[2 * i], (n,)) * self.imgfilter_std)
            t_i = jnp.where(
                jax.random.uniform(keys[2 * i + 1], (n,)) < self.imgfilter * p * band_strength,
                t_i, 1.0)
            t = jnp.ones((n, num_bands)).at[:, i].set(t_i)
            t = t / jnp.sqrt(
                jnp.sum(expected_power * jnp.square(t), axis=-1, keepdims=True))
            g = g * t
        Hz_prime = g @ jnp.asarray(self.Hz_fbank)                    # (N, taps)
        taps = self.Hz_fbank.shape[1]
        pad = taps // 2
        xp = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     mode="reflect")

        def sep_filter(img, f):  # img (H', W', C); f (taps,)
            # vertical then horizontal correlation, per sample
            v = jax.lax.conv_general_dilated(
                img[None], jnp.tile(f[:, None, None, None], (1, 1, 1, img.shape[-1])),
                (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=img.shape[-1])[0]
            hconv = jax.lax.conv_general_dilated(
                v[None], jnp.tile(f[None, :, None, None], (1, 1, 1, img.shape[-1])),
                (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=img.shape[-1])[0]
            return hconv

        return jax.vmap(sep_filter)(xp, Hz_prime)


def _rotate3d_about(axis: Array, theta: Array) -> Array:
    """4x4 rotation about a 3-vector axis (reference ada_aug.py:89-97)."""
    n = theta.shape[0]
    vx, vy, vz = axis[0], axis[1], axis[2]
    s, cth = jnp.sin(theta), jnp.cos(theta)
    cc = 1 - cth
    rows = [
        [vx * vx * cc + cth, vx * vy * cc - vz * s, vx * vz * cc + vy * s, jnp.zeros((n,))],
        [vy * vx * cc + vz * s, vy * vy * cc + cth, vy * vz * cc - vx * s, jnp.zeros((n,))],
        [vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + cth, jnp.zeros((n,))],
        [jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)), jnp.ones((n,))],
    ]
    rows = [[jnp.broadcast_to(e, (n,)) for e in r] for r in rows]
    return jnp.stack([jnp.stack(r, axis=1) for r in rows], axis=1)
