"""Fused SAGAN pooled-key attention (Pallas TPU kernel).

The reference computes attention as three separate bmms + a softmax
(reference src/utils/ops.py:84-103).  Under XLA the
``matmul -> softmax -> matmul`` chain cannot fuse, so the (N, HW, HW/4)
attention map makes 4+ HBM round-trips per call; profiling the BigGAN
ImageNet-128 step (scripts/profile_imagenet128.py ablate256) shows
attention costing ~30% of the wall time while contributing ~2% of the
FLOPs — it is pure HBM bandwidth.

This kernel runs one (batch-element, query-chunk) grid cell entirely in
VMEM: logits -> softmax -> @g without ever materializing the map in
HBM.  Because SAGAN's keys are 2x2-maxpool-reduced (HW/4 of them), a
full key row fits VMEM per chunk and NO online-softmax correction is
needed — this is exact, not an approximation.

Math matches studiogan_tpu.ops.layers.SelfAttention's ``attend``:
logits and the AV product accumulate in f32 (preferred_element_type),
the softmax runs in f32, and the attention weights are cast to the
input dtype before the AV matmul.  The backward pass is a second Pallas
kernel (custom_vjp) recomputing the chunk's softmax in VMEM —
flash-attention-style, with dPhi/dG accumulated across query chunks in
f32 output blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _softmax_f32(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(th_ref, ph_ref, g_ref, o_ref):
    th = th_ref[0]                                   # (CHUNK, dk)
    ph = ph_ref[0]                                   # (K, dk)
    logits = jax.lax.dot_general(
        th, ph, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (CHUNK, K)
    a = _softmax_f32(logits).astype(o_ref.dtype)
    o_ref[0] = jnp.dot(a, g_ref[0],
                       preferred_element_type=jnp.float32
                       ).astype(o_ref.dtype)


def _bwd_kernel(th_ref, ph_ref, g_ref, do_ref,
                dth_ref, dph_ref, dg_ref):
    q = pl.program_id(1)
    th = th_ref[0]
    ph = ph_ref[0]
    g = g_ref[0]
    do = do_ref[0]

    logits = jax.lax.dot_general(
        th, ph, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    a32 = _softmax_f32(logits)                       # (CHUNK, K) f32
    a_lp = a32.astype(th.dtype)

    # o = a_lp @ g  =>  dg += a_lp^T do ;  da = do g^T
    dg_c = jax.lax.dot_general(
        a_lp, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (K, dv)
    da = jax.lax.dot_general(
        do, g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (CHUNK, K)
    # softmax vjp in f32 (the bf16 cast's grad is identity-then-cast)
    ds = a32 * (da - jnp.sum(da * a32, axis=-1, keepdims=True))
    ds_lp = ds.astype(th.dtype)
    # logits = th @ ph^T  =>  dth = ds ph ;  dph += ds^T th
    dth = jnp.dot(ds_lp, ph, preferred_element_type=jnp.float32)
    dph_c = jax.lax.dot_general(
        ds_lp, th, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (K, dk)

    dth_ref[0] = dth.astype(dth_ref.dtype)

    @pl.when(q == 0)
    def _():
        dph_ref[0] = jnp.zeros_like(dph_ref[0])
        dg_ref[0] = jnp.zeros_like(dg_ref[0])

    dph_ref[0] += dph_c
    dg_ref[0] += dg_c


def _block_specs(n_q, chunk, K, dk, dv):
    th_spec = pl.BlockSpec((1, chunk, dk), lambda n, q: (n, q, 0),
                           memory_space=pltpu.VMEM)
    ph_spec = pl.BlockSpec((1, K, dk), lambda n, q: (n, 0, 0),
                           memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, K, dv), lambda n, q: (n, 0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, chunk, dv), lambda n, q: (n, q, 0),
                          memory_space=pltpu.VMEM)
    return th_spec, ph_spec, g_spec, o_spec


@functools.partial(jax.jit, static_argnames=("chunk",))
def _fwd(theta: Array, phi: Array, g: Array, chunk: int) -> Array:
    n, Q, dk = theta.shape
    _, K, dv = g.shape
    th_spec, ph_spec, g_spec, o_spec = _block_specs(Q // chunk, chunk,
                                                    K, dk, dv)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(n, Q // chunk),
        in_specs=[th_spec, ph_spec, g_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((n, Q, dv), theta.dtype),
    )(theta, phi, g)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _bwd(theta: Array, phi: Array, g: Array, do: Array, chunk: int):
    n, Q, dk = theta.shape
    _, K, dv = g.shape
    th_spec, ph_spec, g_spec, o_spec = _block_specs(Q // chunk, chunk,
                                                    K, dk, dv)
    do_spec = o_spec
    dth_spec = pl.BlockSpec((1, chunk, dk), lambda n, q: (n, q, 0),
                            memory_space=pltpu.VMEM)
    dph_spec = pl.BlockSpec((1, K, dk), lambda n, q: (n, 0, 0),
                            memory_space=pltpu.VMEM)
    dg_spec = pl.BlockSpec((1, K, dv), lambda n, q: (n, 0, 0),
                           memory_space=pltpu.VMEM)
    dth, dph, dg = pl.pallas_call(
        _bwd_kernel,
        grid=(n, Q // chunk),
        in_specs=[th_spec, ph_spec, g_spec, do_spec],
        out_specs=(dth_spec, dph_spec, dg_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, Q, dk), theta.dtype),
            # dPhi/dG accumulate across query chunks — keep them f32 in
            # the kernel for accuracy, cast to input dtype outside
            jax.ShapeDtypeStruct((n, K, dk), jnp.float32),
            jax.ShapeDtypeStruct((n, K, dv), jnp.float32),
        ),
    )(theta, phi, g, do)
    return dth, dph.astype(phi.dtype), dg.astype(g.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_pooled_attention(theta: Array, phi: Array, g: Array,
                           chunk: int = 512) -> Array:
    """softmax(theta @ phi^T) @ g, fused per (batch, query-chunk) in VMEM.

    theta: (N, Q, dk) queries; phi: (N, K, dk) pooled keys;
    g: (N, K, dv) pooled values.  Requires Q % chunk == 0.
    Returns (N, Q, dv) in theta's dtype."""
    return _fwd(theta, phi, g, chunk)


def _vjp_fwd(theta, phi, g, chunk):
    return _fwd(theta, phi, g, chunk), (theta, phi, g)


def _vjp_bwd(chunk, res, do):
    theta, phi, g = res
    return _bwd(theta, phi, g, do.astype(theta.dtype), chunk)


fused_pooled_attention.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------------------
# Experimental variant (round-4 verdict item 7): SAVE the attention map in
# the forward pass (low-precision, HBM-resident) and skip the logits +
# softmax recompute in the backward kernel.  Trades ~2.1 GB of HBM traffic
# + residency (N=256, Q=4096, K=1024 bf16) for the recomputation's MXU/VPU
# work.  The saved map is the bf16-rounded softmax, so dPhi/dTheta pick up
# ~bf16-epsilon relative error vs the recompute path (measured in
# scripts/profile_attention.py savemap).  Enabled via
# SelfAttention(..) impl="pallas_savemap" / STUDIOGAN_ATTN_IMPL.
# --------------------------------------------------------------------------

def _fwd_kernel_savemap(th_ref, ph_ref, g_ref, o_ref, a_ref):
    th = th_ref[0]
    ph = ph_ref[0]
    logits = jax.lax.dot_general(
        th, ph, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    a = _softmax_f32(logits).astype(o_ref.dtype)
    a_ref[0] = a
    o_ref[0] = jnp.dot(a, g_ref[0],
                       preferred_element_type=jnp.float32
                       ).astype(o_ref.dtype)


def _bwd_kernel_frommap(a_ref, ph_ref, th_ref, g_ref, do_ref,
                        dth_ref, dph_ref, dg_ref):
    q = pl.program_id(1)
    a_lp = a_ref[0]                                  # (CHUNK, K) saved map
    a32 = a_lp.astype(jnp.float32)
    th = th_ref[0]
    g = g_ref[0]
    do = do_ref[0]

    dg_c = jax.lax.dot_general(
        a_lp, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (K, dv)
    da = jax.lax.dot_general(
        do, g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (CHUNK, K)
    ds = a32 * (da - jnp.sum(da * a32, axis=-1, keepdims=True))
    ds_lp = ds.astype(th.dtype)
    dth = jnp.dot(ds_lp, ph_ref[0], preferred_element_type=jnp.float32)
    dph_c = jax.lax.dot_general(
        ds_lp, th, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (K, dk)

    dth_ref[0] = dth.astype(dth_ref.dtype)

    @pl.when(q == 0)
    def _():
        dph_ref[0] = jnp.zeros_like(dph_ref[0])
        dg_ref[0] = jnp.zeros_like(dg_ref[0])

    dph_ref[0] += dph_c
    dg_ref[0] += dg_c


@functools.partial(jax.jit, static_argnames=("chunk",))
def _fwd_savemap(theta: Array, phi: Array, g: Array, chunk: int):
    n, Q, dk = theta.shape
    _, K, dv = g.shape
    th_spec, ph_spec, g_spec, o_spec = _block_specs(Q // chunk, chunk,
                                                    K, dk, dv)
    a_spec = pl.BlockSpec((1, chunk, K), lambda n, q: (n, q, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel_savemap,
        grid=(n, Q // chunk),
        in_specs=[th_spec, ph_spec, g_spec],
        out_specs=(o_spec, a_spec),
        out_shape=(jax.ShapeDtypeStruct((n, Q, dv), theta.dtype),
                   jax.ShapeDtypeStruct((n, Q, K), theta.dtype)),
    )(theta, phi, g)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _bwd_frommap(a: Array, theta: Array, phi: Array, g: Array, do: Array,
                 chunk: int):
    n, Q, dk = theta.shape
    _, K, dv = g.shape
    th_spec, ph_spec, g_spec, o_spec = _block_specs(Q // chunk, chunk,
                                                    K, dk, dv)
    a_spec = pl.BlockSpec((1, chunk, K), lambda n, q: (n, q, 0),
                          memory_space=pltpu.VMEM)
    dth_spec = pl.BlockSpec((1, chunk, dk), lambda n, q: (n, q, 0),
                            memory_space=pltpu.VMEM)
    dph_spec = pl.BlockSpec((1, K, dk), lambda n, q: (n, 0, 0),
                            memory_space=pltpu.VMEM)
    dg_spec = pl.BlockSpec((1, K, dv), lambda n, q: (n, 0, 0),
                           memory_space=pltpu.VMEM)
    dth, dph, dg = pl.pallas_call(
        _bwd_kernel_frommap,
        grid=(n, Q // chunk),
        in_specs=[a_spec, ph_spec, th_spec, g_spec, o_spec],
        out_specs=(dth_spec, dph_spec, dg_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, Q, dk), theta.dtype),
            jax.ShapeDtypeStruct((n, K, dk), jnp.float32),
            jax.ShapeDtypeStruct((n, K, dv), jnp.float32),
        ),
    )(a, phi, theta, g, do)
    return dth, dph.astype(phi.dtype), dg.astype(g.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_pooled_attention_savemap(theta: Array, phi: Array, g: Array,
                                   chunk: int = 512) -> Array:
    """fused_pooled_attention, but the bwd reuses the fwd's saved
    (bf16/HBM) attention map instead of recomputing logits+softmax."""
    return _fwd_savemap(theta, phi, g, chunk)[0]


def _vjp_fwd_savemap(theta, phi, g, chunk):
    o, a = _fwd_savemap(theta, phi, g, chunk)
    return o, (a, theta, phi, g)


def _vjp_bwd_savemap(chunk, res, do):
    a, theta, phi, g = res
    return _bwd_frommap(a, theta, phi, g, do.astype(theta.dtype), chunk)


fused_pooled_attention_savemap.defvjp(_vjp_fwd_savemap, _vjp_bwd_savemap)
