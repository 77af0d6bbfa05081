"""Pallas fused bias+act+gain+clamp (parity target: reference
src/utils/style_ops/bias_act.cu, 310 lines of CUDA).

On TPU this chain is VPU work; the kernel exists to (a) guarantee the
fusion regardless of surrounding XLA fusion decisions and (b) serve as
the drop-in ``impl='pallas'`` of studiogan_tpu.ops.bias_act.  Gradients
come from JAX AD through the same kernel body (Pallas supports AD for
elementwise kernels); the CUDA version hand-codes them.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from studiogan_tpu.ops.bias_act import activation_funcs

Array = jax.Array


def _make_kernel(act: str, alpha: float, gain: float, clamp: float | None,
                 has_bias: bool):
    spec = activation_funcs[act]

    if has_bias:
        def kernel(x_ref, b_ref, o_ref):
            y = x_ref[:] + b_ref[:]
            y = spec.func(y, alpha=alpha)
            if gain != 1.0:
                y = y * gain
            if clamp is not None:
                y = jnp.clip(y, -clamp, clamp)
            o_ref[:] = y
    else:
        def kernel(x_ref, o_ref):
            y = spec.func(x_ref[:], alpha=alpha)
            if gain != 1.0:
                y = y * gain
            if clamp is not None:
                y = jnp.clip(y, -clamp, clamp)
            o_ref[:] = y
    return kernel


@functools.partial(jax.jit, static_argnames=("act", "alpha", "gain", "clamp"))
def _call(x, b, act, alpha, gain, clamp):
    kernel = _make_kernel(act, alpha, gain, clamp, b is not None)
    flat = x.reshape(-1, x.shape[-1])
    args = (flat,) if b is None else (flat, jnp.broadcast_to(b, flat.shape))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(flat.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*args)
    return out.reshape(x.shape)


def bias_act_pallas(x: Array, b: Array | None = None, dim: int = -1,
                    act: str = "linear", alpha: float | None = None,
                    gain: float | None = None,
                    clamp: float | None = None) -> Array:
    spec = activation_funcs[act]
    alpha = float(spec.def_alpha if alpha is None else alpha)
    gain = float(spec.def_gain if gain is None else gain)
    if b is not None and dim not in (-1, x.ndim - 1):
        shape = [1] * x.ndim
        shape[dim] = -1
        return _call(x + b.reshape(shape), None, act, alpha, gain, clamp)
    return _call(x, b, act, alpha, gain, clamp)
