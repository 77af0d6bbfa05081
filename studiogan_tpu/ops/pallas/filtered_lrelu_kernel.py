"""Pallas fused filtered_lrelu (parity target: reference
src/utils/style_ops/filtered_lrelu.cu + _ns/_rd/_wr.cu, ~1.7k lines of
CUDA).

TPU-native formulation: a separable 1-D upfirdn is a banded linear
operator, so the whole op is

    Y = D_h @ lrelu( U_h @ X @ U_w^T + b ) @ D_w^T        (per channel)

with static (numpy-precomputed) matrices U (zero-insert upsample + FIR
+ pad) and D (FIR + decimate).  The Pallas kernel runs the three
matmuls and the fused elementwise middle entirely in VMEM per
(batch, channel-block) grid cell — the 2x-upsampled intermediate never
touches HBM, which is exactly what the CUDA kernel's shared-memory
tiling buys on GPU.  The MXU executes the FIR matmuls.

Correctness oracle: studiogan_tpu.ops.filtered_lrelu (the ref
decomposition, reference filtered_lrelu.py:120-155).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from studiogan_tpu.ops.upfirdn2d import _parse_padding

Array = jax.Array


def _upfirdn1d_matrix(f: np.ndarray, n_in: int, up: int, down: int,
                      p0: int, p1: int, gain: float) -> np.ndarray:
    """Dense matrix M with (M @ x) == upfirdn1d(x): zero-insert by ``up``,
    pad (p0, p1), convolve with ``f`` (true convolution), keep every
    ``down``-th sample.  Matches ops/upfirdn2d.py's conv formulation."""
    f = np.asarray(f, np.float64) * gain
    taps = len(f)
    fc = f[::-1]  # convolution
    n_up = n_in * up  # zero-insert appends up-1 zeros after each sample
    n_pad = p0 + n_up + p1
    n_out = (n_pad - taps) // down + 1
    m = np.zeros((n_out, n_in), np.float64)
    for o in range(n_out):
        for k in range(taps):
            i = o * down + k - p0  # index into x_up
            if 0 <= i < n_up and i % up == 0:
                m[o, i // up] += fc[k]
    return m.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _build_mats(fu_t: tuple, fd_t: tuple, h: int, w: int, up: int, down: int,
                padding: tuple, gain_up: float):
    fu = np.asarray(fu_t, np.float64) if fu_t else np.ones(1)
    fd = np.asarray(fd_t, np.float64) if fd_t else np.ones(1)
    px0, px1, py0, py1 = padding
    g = math.sqrt(gain_up)  # per-axis share of the up gain (up**2 total)
    U_h = _upfirdn1d_matrix(fu, h, up, 1, py0, py1, g)
    U_w = _upfirdn1d_matrix(fu, w, up, 1, px0, px1, g)
    D_h = _upfirdn1d_matrix(fd, U_h.shape[0], 1, down, 0, 0, 1.0)
    D_w = _upfirdn1d_matrix(fd, U_w.shape[0], 1, down, 0, 0, 1.0)
    return U_h, U_w, D_h, D_w


def filtered_lrelu_pallas(x: Array, fu=None, fd=None, b: Array | None = None,
                          up: int = 1, down: int = 1, padding=0,
                          gain: float = math.sqrt(2), slope: float = 0.2,
                          clamp: float | None = None,
                          channel_block: int = 128,
                          interpret: bool = False) -> Array:
    """NHWC fused filtered_lrelu.  Same contract as
    studiogan_tpu.ops.filtered_lrelu (1-D/None filters only)."""
    n, h, w, c = x.shape
    assert fu is None or np.asarray(fu).ndim == 1
    assert fd is None or np.asarray(fd).ndim == 1
    pad = _parse_padding(padding)
    fu_t = tuple(np.asarray(fu, np.float64).tolist()) if fu is not None else ()
    fd_t = tuple(np.asarray(fd, np.float64).tolist()) if fd is not None else ()
    U_h, U_w, D_h, D_w = _build_mats(fu_t, fd_t, h, w, up, down, pad,
                                     float(up ** 2))
    hm, wm = U_h.shape[0], U_w.shape[0]
    ho, wo = D_h.shape[0], D_w.shape[0]

    if b is None:
        b = jnp.zeros((c,), x.dtype)

    # feasibility: the per-grid-cell VMEM working set is the input tile +
    # the 2x-upsampled intermediate + output tile.  Mosaic requires the
    # last block dim to be a multiple of 128, so the channel block cannot
    # shrink — pad C up to a multiple of 128, and fall back to the ref
    # decomposition when the 128-channel working set exceeds VMEM
    # (large-spatial layers; measured envelope: wins at ~36-64px/512ch,
    # scripts/profile_filtered_lrelu.py).
    cb = 128
    vmem_est = (h * w + hm * w + hm * wm + ho * wm + ho * wo) * cb * 4
    if vmem_est > 15 * 1024 * 1024:
        from studiogan_tpu.ops.filtered_lrelu import filtered_lrelu
        return filtered_lrelu(x, fu, fd, b, up=up, down=down, padding=padding,
                              gain=gain, slope=slope, clamp=clamp, impl="ref")
    c_pad = -(-c // cb) * cb
    if c_pad != c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))
        b = jnp.pad(b.reshape(-1), (0, c_pad - c))
    c_eff = c_pad

    def kernel(x_ref, b_ref, uh_ref, uw_ref, dh_ref, dw_ref, o_ref):
        # x_ref: (1, h, w, cb); matrices in VMEM
        # bias is added BEFORE the upsample (reference filtered_lrelu.py:145)
        xt = x_ref[0].astype(jnp.float32) + b_ref[0][None, None, :]
        # up: (hm, w, cb) = U_h @ x   — contract over h
        t = jnp.einsum("oh,hwc->owc", uh_ref[:], xt,
                       preferred_element_type=jnp.float32)
        # (hm, wm, cb) = t @ U_w^T — contract over w
        t = jnp.einsum("ow,hwc->hoc", uw_ref[:], t,
                       preferred_element_type=jnp.float32)
        t = jnp.where(t >= 0, t, t * slope) * gain
        if clamp is not None:
            t = jnp.clip(t, -clamp, clamp)
        # down: contract
        t = jnp.einsum("oh,hwc->owc", dh_ref[:], t,
                       preferred_element_type=jnp.float32)
        t = jnp.einsum("ow,hwc->hoc", dw_ref[:], t,
                       preferred_element_type=jnp.float32)
        o_ref[0] = t.astype(o_ref.dtype)

    grid = (n, c_eff // cb)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, cb), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((hm, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wm, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ho, hm), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wo, wm), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ho, wo, cb), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, c_eff), x.dtype),
        interpret=interpret,
    )(x, b.astype(x.dtype).reshape(1, c_eff), jnp.asarray(U_h),
      jnp.asarray(U_w), jnp.asarray(D_h), jnp.asarray(D_w))
    return out[..., :c] if c_eff != c else out
