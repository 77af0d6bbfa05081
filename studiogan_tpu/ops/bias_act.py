"""Fused bias + activation + gain + clamp.

Capability parity with reference src/utils/style_ops/bias_act.py (the
CUDA op at bias_act.cu).  On TPU the chain bias->act->gain->clamp is a
single VPU-fused elementwise epilogue that XLA fuses into the producing
matmul/conv, so the jnp expression below IS the fast path; JAX provides
the first/second-order gradients the CUDA op hand-codes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from collections.abc import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclass(frozen=True)
class _ActSpec:
    func: Callable
    def_alpha: float = 0.0
    def_gain: float = 1.0


activation_funcs: dict[str, _ActSpec] = {
    "linear": _ActSpec(lambda x, **_: x),
    "relu": _ActSpec(lambda x, **_: jax.nn.relu(x), def_gain=math.sqrt(2)),
    "lrelu": _ActSpec(lambda x, alpha, **_: jax.nn.leaky_relu(x, alpha),
                      def_alpha=0.2, def_gain=math.sqrt(2)),
    "tanh": _ActSpec(lambda x, **_: jnp.tanh(x)),
    "sigmoid": _ActSpec(lambda x, **_: jax.nn.sigmoid(x)),
    "elu": _ActSpec(lambda x, **_: jax.nn.elu(x)),
    "selu": _ActSpec(lambda x, **_: jax.nn.selu(x)),
    "softplus": _ActSpec(lambda x, **_: jax.nn.softplus(x)),
    "swish": _ActSpec(lambda x, **_: jax.nn.sigmoid(x) * x, def_gain=math.sqrt(2)),
}


def bias_act(x: Array, b: Array | None = None, dim: int = -1, act: str = "linear",
             alpha: float | None = None, gain: float | None = None,
             clamp: float | None = None) -> Array:
    """y = clamp(gain * act(x + b)); all steps optional.

    ``dim`` is the channel axis of ``b`` (default -1: NHWC channels; the
    NCHW reference defaults to 1).
    """
    spec = activation_funcs[act]
    alpha = float(spec.def_alpha if alpha is None else alpha)
    gain = float(spec.def_gain if gain is None else gain)
    assert clamp is None or clamp >= 0

    if b is not None:
        assert b.ndim == 1 and b.shape[0] == x.shape[dim]
        shape = [1] * x.ndim
        shape[dim] = -1
        # compute in x's dtype (reference bias_act.cu computes in x's
        # type): an f32 bias PARAM must not promote a bf16 activation —
        # an uncast bias here silently disabled the per-res bf16 policy
        # for every Conv2dLayer (and doubled 512/1024px D activation
        # memory: the FFHQ-1024 bs4 smoke OOM'd at 23.6G/15.75G on f32
        # temps that should have been bf16)
        x = x + b.reshape(shape).astype(x.dtype)
    x = spec.func(x, alpha=alpha)
    if gain != 1.0:
        x = x * gain
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return x
