"""Chip-side validation + profiling of the fused Pallas SAGAN attention
(ops/pallas/attention_kernel.py) at real BigGAN-128 shapes.

    python scripts/profile_attention.py [parity|perf|step|all]

parity: fwd+grad vs the chunked-scan reference path (bf16 + f32).
perf:   isolated op timing fused vs chunked-scan vs dense.
step:   full ImageNet-128 bs256 bf16 train step with/without the kernel
        (STUDIOGAN_ATTN_IMPL=chunked vs auto).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _shapes(n=256, hw=4096, c=192):
    rng = np.random.RandomState(0)
    th = rng.randn(n, hw, c // 8).astype(np.float32) * 0.3
    ph = rng.randn(n, hw // 4, c // 8).astype(np.float32) * 0.3
    g = rng.randn(n, hw // 4, c // 2).astype(np.float32) * 0.3
    return th, ph, g


def _ref_chunked(th, ph, g, chunk=512):
    n, Q, dk = th.shape

    def attend(t):
        a = jax.nn.softmax(
            jnp.einsum("nqc,nkc->nqk", t, ph,
                       preferred_element_type=jnp.float32), axis=-1
        ).astype(th.dtype)
        return jnp.einsum("nqk,nkc->nqc", a, g,
                          preferred_element_type=jnp.float32).astype(th.dtype)

    th_c = jnp.moveaxis(th.reshape(n, Q // chunk, chunk, dk), 1, 0)
    _, o = jax.lax.scan(
        jax.checkpoint(lambda carry, t: (carry, attend(t))), None, th_c)
    return jnp.moveaxis(o, 0, 1).reshape(n, Q, -1)


def parity(dtype=jnp.bfloat16, n=16):
    from studiogan_tpu.ops.pallas.attention_kernel import \
        fused_pooled_attention
    th, ph, g = _shapes(n=n)
    th, ph, g = (jnp.asarray(a, dtype) for a in (th, ph, g))

    out_k = jax.jit(lambda *a: fused_pooled_attention(*a, 512))(th, ph, g)
    out_r = jax.jit(_ref_chunked)(th, ph, g)
    err = float(jnp.abs(out_k.astype(jnp.float32)
                        - out_r.astype(jnp.float32)).max())
    scale = float(jnp.abs(out_r.astype(jnp.float32)).max())
    print(f"[{dtype.__name__}] fwd max abs err {err:.3e} (scale {scale:.3f})",
          flush=True)

    def loss_k(args):
        return jnp.sum(jnp.sin(fused_pooled_attention(*args, 512)
                               .astype(jnp.float32)))

    def loss_r(args):
        return jnp.sum(jnp.sin(_ref_chunked(*args).astype(jnp.float32)))

    gk = jax.jit(jax.grad(loss_k))((th, ph, g))
    gr = jax.jit(jax.grad(loss_r))((th, ph, g))
    for a, b, name in zip(gk, gr, ("theta", "phi", "g")):
        e = float(jnp.abs(a.astype(jnp.float32)
                          - b.astype(jnp.float32)).max())
        s = float(jnp.abs(b.astype(jnp.float32)).max())
        print(f"[{dtype.__name__}] d{name} max abs err {e:.3e} "
              f"(scale {s:.3f})", flush=True)


def _time(fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda x: x, out)
    float(jax.tree.leaves(out)[0].ravel()[0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def perf(dtype=jnp.bfloat16):
    from studiogan_tpu.ops.pallas.attention_kernel import \
        fused_pooled_attention
    th, ph, g = _shapes(n=256)
    th, ph, g = (jnp.asarray(a, dtype) for a in (th, ph, g))

    def grad_of(f):
        return jax.jit(jax.grad(lambda args: jnp.sum(
            f(*args).astype(jnp.float32))))

    fused = jax.jit(lambda *a: fused_pooled_attention(*a, 512))
    chunked = jax.jit(_ref_chunked)
    print(f"fused   fwd: {_time(fused, th, ph, g)*1e3:7.2f} ms", flush=True)
    print(f"chunked fwd: {_time(chunked, th, ph, g)*1e3:7.2f} ms", flush=True)
    gf = grad_of(lambda *a: fused_pooled_attention(*a, 512))
    gc = grad_of(_ref_chunked)
    print(f"fused   f+b: {_time(gf, (th, ph, g))*1e3:7.2f} ms", flush=True)
    print(f"chunked f+b: {_time(gc, (th, ph, g))*1e3:7.2f} ms", flush=True)


def step():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_imagenet128 import _cfg, bench_cfg
    for impl in ("chunked", "auto"):
        os.environ["STUDIOGAN_ATTN_IMPL"] = impl
        bench_cfg(_cfg(256, 1, mpc=True),
                  label=f"bs256 bf16 attn={impl}")


def savemap(dtype=jnp.bfloat16):
    """Round-4 verdict item 7 experiment: does skipping the backward
    logits+softmax recompute (saved bf16 map in HBM) beat the
    recompute kernel?  Reports isolated f+b time for both, the grad
    divergence introduced by the bf16-rounded map, and — if asked with
    'savemap step' — the whole-step effect."""
    from studiogan_tpu.ops.pallas.attention_kernel import (
        fused_pooled_attention, fused_pooled_attention_savemap)
    th, ph, g = _shapes(n=256)
    th, ph, g = (jnp.asarray(a, dtype) for a in (th, ph, g))

    def grad_of(f):
        return jax.jit(jax.grad(lambda args: jnp.sum(
            f(*args).astype(jnp.float32))))

    for chunk in (512, 1024):
        try:
            f_re = grad_of(lambda *a: fused_pooled_attention(*a, chunk))
            f_sm = grad_of(lambda *a: fused_pooled_attention_savemap(*a, chunk))
            t_re = _time(f_re, (th, ph, g))
            t_sm = _time(f_sm, (th, ph, g))
            print(f"chunk={chunk}: recompute f+b {t_re*1e3:7.2f} ms | "
                  f"savemap f+b {t_sm*1e3:7.2f} ms "
                  f"({t_re/t_sm:.2f}x)", flush=True)
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            print(f"chunk={chunk}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    # grad divergence of the bf16-map reuse (vs the recompute kernel)
    g_re = grad_of(lambda *a: fused_pooled_attention(*a, 512))((th, ph, g))
    g_sm = grad_of(lambda *a: fused_pooled_attention_savemap(*a, 512))(
        (th, ph, g))
    for a, b, name in zip(g_sm, g_re, ("theta", "phi", "g")):
        e = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
        s = float(jnp.abs(b.astype(jnp.float32)).max())
        print(f"savemap d{name} max abs dev {e:.3e} (scale {s:.3f})",
              flush=True)


def savemap_step():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_imagenet128 import _cfg, bench_cfg
    for impl in ("pallas", "pallas_savemap"):
        os.environ["STUDIOGAN_ATTN_IMPL"] = impl
        bench_cfg(_cfg(256, 1, mpc=True),
                  label=f"bs256 bf16 attn={impl}")


def dkpad(dtype=jnp.bfloat16):
    """Round-4 verdict item 7 experiment: the roofline blames the dk=24
    logits contraction (19% MXU depth utilization).  If that depth were
    the wall-clock culprit, padding dk 24 -> 128 (5.3x the FLOPs at
    full depth) should cost ~the same wall time; if the padded run is
    ~5x slower, depth under-utilization was never costing wall time and
    the attention gap lives elsewhere (VPU softmax / grid overhead)."""
    from studiogan_tpu.ops.pallas.attention_kernel import \
        fused_pooled_attention

    def grad_of(f):
        return jax.jit(jax.grad(lambda args: jnp.sum(
            f(*args).astype(jnp.float32))))

    for dk in (24, 128):
        rng = np.random.RandomState(0)
        th = jnp.asarray(rng.randn(256, 4096, dk) * 0.3, dtype)
        ph = jnp.asarray(rng.randn(256, 1024, dk) * 0.3, dtype)
        g = jnp.asarray(rng.randn(256, 1024, 96) * 0.3, dtype)
        fwd = jax.jit(lambda *a: fused_pooled_attention(*a, 512))
        fb = grad_of(lambda *a: fused_pooled_attention(*a, 512))
        print(f"dk={dk:3d}: fwd {_time(fwd, th, ph, g)*1e3:7.2f} ms | "
              f"f+b {_time(fb, (th, ph, g))*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices(), flush=True)
    if mode in ("parity", "all"):
        parity(jnp.float32)
        parity(jnp.bfloat16)
    if mode in ("perf", "all"):
        perf()
    if mode == "savemap":
        savemap()
        if "step" in sys.argv[2:]:
            savemap_step()
    if mode == "dkpad":
        dkpad()
    if mode in ("step", "all"):
        step()
