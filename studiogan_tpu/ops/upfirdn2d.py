"""upfirdn2d: pad -> upsample -> FIR filter -> downsample, NHWC.

Capability parity with reference src/utils/style_ops/upfirdn2d.py
(CUDA kernel upfirdn2d.cu; python ref at upfirdn2d.py:166).  Two
TPU-native formulations:

  * ``depthwise`` — one ``lax.conv_general_dilated`` with
    feature_group_count=C: ``lhs_dilation`` is the zero-insertion
    upsample, ``window_strides`` the downsample.  Compact, but a
    C-group conv runs on the VPU, not the MXU.
  * ``matmul`` (opt-in: STUDIOGAN_UPFIRDN_IMPL=matmul) — a 1-D upfirdn
    is a banded linear operator, so each axis pass is a dense (out, in)
    matmul built once in numpy at trace time:
    ``einsum('oh,nhwc->nowc')``.  The FLOPs run on the MXU (the same
    trick the Pallas filtered_lrelu kernel uses).  StyleGAN's
    (1,3,3,1)-style 2-D filters are outer products, detected as rank-1
    and factored back into two 1-D passes.

Measured on the chip (StyleGAN2-D2DCE CIFAR full step): depthwise 88.9
ms vs matmul 97.7 ms — at <=32px/4-tap shapes XLA's depthwise lowering
is already cheap and the einsum pays extra layout shuffles, so ``auto``
resolves to depthwise.  Revisit for large-spatial/long-tap workloads
(scripts/profile_filtered_lrelu.py).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array

# "auto" | "matmul" | "depthwise" (env override for benchmarks)
_IMPL = os.environ.get("STUDIOGAN_UPFIRDN_IMPL", "auto")
_MATMUL_MAX_DIM = 1024  # beyond this the dense band matrix gets wasteful


def _parse_scaling(scaling) -> tuple[int, int]:
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding) -> tuple[int, int, int, int]:
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    px0, px1, py0, py1 = padding
    return int(px0), int(px1), int(py0), int(py1)


def setup_filter(f, normalize: bool = True, flip_filter: bool = False,
                 gain: float = 1.0, separable: bool | None = None) -> np.ndarray:
    """Prepare a FIR filter (reference upfirdn2d.py:70-115)."""
    if f is None:
        f = 1.0
    f = np.asarray(f, dtype=np.float64)
    assert f.ndim in (0, 1, 2)
    if f.ndim == 0:
        f = f[np.newaxis]
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    assert f.ndim == (1 if separable else 2)
    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = np.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return f.astype(np.float32)


def _depthwise(x: Array, f: Array, up: tuple[int, int], down: tuple[int, int],
               pad: tuple[int, int, int, int]) -> Array:
    """Depthwise conv, NHWC, filter (kh, kw) broadcast over channels."""
    c = x.shape[-1]
    upx, upy = up
    px0, px1, py0, py1 = pad
    kernel = jnp.tile(f[:, :, None, None].astype(x.dtype), (1, 1, 1, c))
    # preferred_element_type only for f32 operands: conv's transpose rule
    # under preferred=f32 with bf16 operands builds a mixed-dtype conv
    # (f32 cotangent x bf16 kernel) and raises; bf16 MXU passes already
    # accumulate in f32 and we round to x.dtype immediately anyway.
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=down[::-1],                       # (down_y, down_x)
        padding=((py0, py1 + upy - 1), (px0, px1 + upx - 1)),
        lhs_dilation=(upy, upx),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=(jnp.float32 if x.dtype == jnp.float32
                                else None),
    ).astype(x.dtype)


def _factor_rank1(f: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    """Factor a 2-D filter into outer(fy, fx) if it is (numerically)
    rank-1 — true for every setup_filter() product of a 1-D filter."""
    u, s, vt = np.linalg.svd(f.astype(np.float64))
    if f.size > 1 and s[0] > 0 and (len(s) == 1 or s[1] <= 1e-9 * s[0]):
        r = np.sqrt(s[0])
        return (u[:, 0] * r).astype(np.float32), (vt[0] * r).astype(np.float32)
    if f.size == 1:
        return (f.reshape(1).astype(np.float32),
                np.ones(1, np.float32))
    return None


def _upfirdn1d_band_coo(f: np.ndarray, n_in: int, up: int, down: int,
                        p0: int, p1: int):
    """COO triplets (rows, cols, vals) + n_out of the 1-D upfirdn band
    operator: zero-insert by ``up``, pad (p0, p1) (negative = crop),
    cross-correlate with ``f`` (caller pre-flips for convolution),
    stride by ``down``."""
    taps = len(f)
    n_up = n_in * up
    n_pad = p0 + n_up + p1
    n_out = max((n_pad - taps) // down + 1, 0)
    rows, cols, vals = [], [], []
    for o in range(n_out):
        base = o * down - p0
        for k in range(taps):
            j = base + k
            if 0 <= j < n_up and j % up == 0:
                rows.append(o)
                cols.append(j // up)
                vals.append(f[k])
    return (np.asarray(rows, np.int32), np.asarray(cols, np.int32),
            np.asarray(vals, np.float32), n_out)


def _upfirdn1d_band(f: np.ndarray, n_in: int, up: int, down: int,
                    p0: int, p1: int) -> np.ndarray:
    """Dense (n_out, n_in) matrix of the 1-D upfirdn (numpy)."""
    rows, cols, vals, n_out = _upfirdn1d_band_coo(f, n_in, up, down, p0, p1)
    m = np.zeros((n_out, n_in), np.float32)
    np.add.at(m, (rows, cols), vals)
    return m


def _matmul_pass(x: Array, f1d: np.ndarray, axis: int, up: int, down: int,
                 p0: int, p1: int) -> Array:
    n_in = x.shape[axis]
    rows, cols, vals, n_out = _upfirdn1d_band_coo(f1d, n_in, up, down, p0, p1)
    if n_out * n_in > 4_000_000:
        # large-spatial band (e.g. 512-1024px ADA filtering): embedding
        # a multi-MB dense constant bloats the executable — materialize
        # the band on device from the tiny COO triplets instead
        m = jnp.zeros((n_out, n_in), x.dtype).at[rows, cols].add(
            vals.astype(x.dtype))
    else:
        m = jnp.asarray(_upfirdn1d_band(f1d, n_in, up, down, p0, p1), x.dtype)
    if x.ndim == 3:  # channels-folded (N*C, H, W) layout (ADA geometry)
        eq = "oh,nhw->now" if axis == 1 else "ow,nhw->nho"
    else:
        eq = "oh,nhwc->nowc" if axis == 1 else "ow,nhwc->nhoc"
    return jnp.einsum(eq, m, x,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def upfirdn2d(x: Array, f: Array | np.ndarray | None, up=1, down=1, padding=0,
              flip_filter: bool = False, gain: float = 1.0) -> Array:
    """NHWC upfirdn2d (reference upfirdn2d.py:118-213).

    f: (kh, kw) filter, (taps,) separable filter, or None (identity).

    x may also be 3-D (N, H, W) — the channels-folded layout the ADA
    geometric pipeline uses so the lane-tiled minormost dim is W (an
    NHWC canvas with C=3 pads the channel dim to 128 lanes, inflating
    512-1024px intermediates ~21-42x).  The 3-D path prefers the
    band-matmul lowering; non-separable/traced filters fall back to a
    (N, H, W, 1) depthwise pass.
    """
    squeeze3d = x.ndim == 3
    if f is None:
        f = np.ones((1, 1), dtype=np.float32)
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    pad = _parse_padding(padding)

    # -- MXU band-matrix path: needs a static (numpy) separable filter --
    # "auto" also routes LARGE-SPATIAL, TINY-CHANNEL calls here (the ADA
    # pipeline's image-space wavelet filtering at 512-1024px): for those
    # shapes XLA lays the grouped-conv output out with (channel, batch)
    # minor tiled T(4,128) — batch pads to 128 lanes and the (N, 2H+pad,
    # 2W+pad, 3) intermediate inflates ~21x (19.3 GB at 512px, observed
    # OOM).  The band-matmul formulation keeps standard matmul layouts.
    # Synthesis-network calls (C >= tens of channels) stay depthwise.
    spatial = max(x.shape[1] * upy, x.shape[2] * upx)
    channels = 1 if squeeze3d else x.shape[-1]
    use_matmul = isinstance(f, np.ndarray) and (
        squeeze3d
        or (_IMPL == "matmul" and spatial <= _MATMUL_MAX_DIM)
        or (_IMPL != "depthwise" and channels <= 4 and spatial >= 256))
    if use_matmul:
        fnp = np.asarray(f, np.float32)
        if fnp.ndim == 1:
            g = float(gain) ** 0.5
            fy, fx = fnp * g, fnp * g
        else:
            fac = _factor_rank1(fnp * float(gain))
            fy, fx = fac if fac is not None else (None, None)
        if fy is not None:
            if not flip_filter:  # convolution semantics
                fy, fx = fy[::-1].copy(), fx[::-1].copy()
            # the band matrix models the full n_in*up zero-inserted
            # sequence (up-1 trailing zeros included), so no dilation
            # fix-up pad is needed here
            x = _matmul_pass(x, fy, 1, upy, downy, pad[2], pad[3])
            x = _matmul_pass(x, fx, 2, upx, downx, pad[0], pad[1])
            return x

    if squeeze3d:  # non-separable/traced filter: single-channel depthwise
        x = x[..., None]
    f = jnp.asarray(f, dtype=jnp.float32)
    assert f.ndim in (1, 2)
    if not flip_filter:  # convolution: flip; lax conv is cross-correlation
        f = jnp.flip(f, axis=tuple(range(f.ndim)))

    if f.ndim == 1:
        g = float(gain) ** 0.5
        # vertical pass (handles up_y/down_y and y padding)
        x = _depthwise(x, (f * g)[:, None], (1, upy), (1, downy),
                       (0, 0, pad[2], pad[3]))
        # horizontal pass
        x = _depthwise(x, (f * g)[None, :], (upx, 1), (downx, 1),
                       (pad[0], pad[1], 0, 0))
    else:
        x = _depthwise(x, f * float(gain), (upx, upy), (downx, downy), pad)
    return x[..., 0] if squeeze3d else x


def filter2d(x: Array, f, padding=0, flip_filter=False, gain=1.0) -> Array:
    """Filter with centered padding (reference upfirdn2d.py:276-309)."""
    fh, fw = _filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)
    p = (px0 + fw // 2, px1 + (fw - 1) // 2, py0 + fh // 2, py1 + (fh - 1) // 2)
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x: Array, f, up=2, padding=0, flip_filter=False, gain=1.0) -> Array:
    """Upsample with centered FIR (reference upfirdn2d.py:312-348)."""
    upx, upy = _parse_scaling(up)
    fh, fw = _filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)
    p = (px0 + (fw + upx - 1) // 2, px1 + (fw - upx) // 2,
         py0 + (fh + upy - 1) // 2, py1 + (fh - upy) // 2)
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter,
                     gain=gain * upx * upy)


def downsample2d(x: Array, f, down=2, padding=0, flip_filter=False, gain=1.0) -> Array:
    """Downsample with centered FIR (reference upfirdn2d.py:351-388)."""
    downx, downy = _parse_scaling(down)
    fh, fw = _filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)
    p = (px0 + (fw - downx + 1) // 2, px1 + (fw - downx) // 2,
         py0 + (fh - downy + 1) // 2, py1 + (fh - downy) // 2)
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)


def _filter_size(f) -> tuple[int, int]:
    if f is None:
        return 1, 1
    f = np.asarray(f)
    return (f.shape[0], f.shape[-1]) if f.ndim >= 1 else (1, 1)
