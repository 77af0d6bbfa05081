"""filtered_lrelu: bias -> FIR upsample -> leaky ReLU -> FIR downsample.

Capability parity with reference src/utils/style_ops/filtered_lrelu.py
(1.7k-line CUDA kernel; correctness oracle = the ref decomposition at
filtered_lrelu.py:120-155).  NHWC.  The composition below hands XLA two
depthwise convs with a fused elementwise epilogue; the Pallas fused
variant (studiogan_tpu/ops/pallas) can be slotted in via ``impl=``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from studiogan_tpu.ops.bias_act import bias_act
from studiogan_tpu.ops.upfirdn2d import upfirdn2d, _parse_padding

Array = jax.Array


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
        # fused Pallas kernel: FIR-as-matmul, intermediate stays in VMEM
        from studiogan_tpu.ops.pallas.filtered_lrelu_kernel import (
            filtered_lrelu_pallas)
        return filtered_lrelu_pallas(x, fu, fd, b, up=up, down=down,
                                     padding=padding, gain=gain, slope=slope,
                                     clamp=clamp)
    px0, px1, py0, py1 = _parse_padding(padding)

    x = bias_act(x, b)                                            # bias
    x = upfirdn2d(x, fu, up=up, padding=(px0, px1, py0, py1),
                  gain=up ** 2, flip_filter=flip_filter)          # upsample
    x = bias_act(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter)      # downsample
    return x
