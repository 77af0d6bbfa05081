"""filtered_lrelu: bias -> FIR upsample -> leaky ReLU -> FIR downsample.

Capability parity with reference src/utils/style_ops/filtered_lrelu.py
(1.7k-line CUDA kernel; correctness oracle = the ref decomposition at
filtered_lrelu.py:120-155).  NHWC.  The composition below hands XLA two
depthwise convs with a fused elementwise epilogue; the Pallas fused
variant (studiogan_tpu/ops/pallas) can be slotted in via ``impl=``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from studiogan_tpu.ops.bias_act import bias_act
from studiogan_tpu.ops.upfirdn2d import upfirdn2d, _parse_padding

Array = jax.Array


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9))
def _pallas_with_ref_grad(x, fu_t, fd_t, up, down, padding, gain, slope,
                          clamp, flip_filter, b):
    """Differentiable wrapper: forward = fused Pallas kernel, backward =
    AD of the ref decomposition (the kernel is forward-only).  Filters
    ride as static tuples so they stay out of the diff path."""
    import numpy as _np
    fu = _np.asarray(fu_t, _np.float32) if fu_t else None
    fd = _np.asarray(fd_t, _np.float32) if fd_t else None
    from studiogan_tpu.ops.pallas.filtered_lrelu_kernel import (
        filtered_lrelu_pallas)
    return filtered_lrelu_pallas(x, fu, fd, b, up=up, down=down,
                                 padding=padding, gain=gain, slope=slope,
                                 clamp=clamp)


def _pallas_fwd(x, fu_t, fd_t, up, down, padding, gain, slope, clamp,
                flip_filter, b):
    out = _pallas_with_ref_grad(x, fu_t, fd_t, up, down, padding, gain,
                                slope, clamp, flip_filter, b)
    return out, (x, b)


def _pallas_bwd(fu_t, fd_t, up, down, padding, gain, slope, clamp,
                flip_filter, res, g):
    x, b = res
    import numpy as _np
    fu = _np.asarray(fu_t, _np.float32) if fu_t else None
    fd = _np.asarray(fd_t, _np.float32) if fd_t else None

    def ref(x, b):
        return filtered_lrelu(x, fu, fd, b, up=up, down=down, padding=padding,
                              gain=gain, slope=slope, clamp=clamp,
                              flip_filter=flip_filter, impl="ref")

    _, vjp = jax.vjp(ref, x, b)
    dx, db = vjp(g)
    return dx, db


_pallas_with_ref_grad.defvjp(_pallas_fwd, _pallas_bwd)


def filtered_lrelu(x: Array, fu=None, fd=None, b: Array | None = None,
                   up: int = 1, down: int = 1, padding=0,
                   gain: float = math.sqrt(2), slope: float = 0.2,
                   clamp: float | None = None, flip_filter: bool = False,
                   impl: str = "ref") -> Array:
    assert x.ndim == 4  # NHWC
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    if impl == "pallas" and not flip_filter and \
            (fu is None or getattr(fu, "ndim", 2) == 1) and \
            (fd is None or getattr(fd, "ndim", 2) == 1):
        # fused Pallas kernel (FIR-as-matmul, intermediate stays in
        # VMEM); backward = AD of the ref path via custom_vjp
        import numpy as _np
        fu_t = tuple(_np.asarray(fu, _np.float64).tolist()) if fu is not None else ()
        fd_t = tuple(_np.asarray(fd, _np.float64).tolist()) if fd is not None else ()
        pad_t = padding if isinstance(padding, int) else tuple(padding)
        bb = jnp.zeros((x.shape[-1],), x.dtype) if b is None else b
        return _pallas_with_ref_grad(x, fu_t, fd_t, up, down, pad_t, gain,
                                     slope, clamp, flip_filter, bb)
    px0, px1, py0, py1 = _parse_padding(padding)

    x = bias_act(x, b)                                            # bias
    x = upfirdn2d(x, fu, up=up, padding=(px0, px1, py0, py1),
                  gain=up ** 2, flip_filter=flip_filter)          # upsample
    x = bias_act(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter)      # downsample
    return x
