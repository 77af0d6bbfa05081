"""Profile Pallas filtered_lrelu vs the XLA ref decomposition on the
chip at StyleGAN3 production shapes (round-3 TODO: at 36px/256ch the
kernel was perf-neutral; check 512ch+ and the real stylegan3-t/r layer
sizes from models/stylegan3.py's layer plan).

python scripts/profile_filtered_lrelu.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from studiogan_tpu.ops.filtered_lrelu import filtered_lrelu
from studiogan_tpu.ops.upfirdn2d import setup_filter


def bench(n, h, c, taps=12, up=2, down=2, iters=20):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, h, c), jnp.float32)
    b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    fu = setup_filter(np.hanning(taps))
    fd = setup_filter(np.hanning(taps))
    pad = taps // 2

    out = {}
    ys = {}
    for impl in ("ref", "pallas"):
        f = jax.jit(lambda x, b: filtered_lrelu(
            x, fu, fd, b, up=up, down=down, padding=pad, impl=impl))
        try:
            y = f(x, b)
            float(y.ravel()[0])
            ys[impl] = np.asarray(y[:1])
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    y = f(x, b)
                float(y.ravel()[0])
                best = min(best, (time.perf_counter() - t0) / iters)
            out[impl] = best
        except Exception as e:
            out[impl] = None
            print(f"  {impl} failed: {type(e).__name__}: {str(e)[:120]}")
    if len(ys) == 2:
        # both paths multiply in bf16 on the MXU (default precision); the
        # kernel has 4 sequential matmul stages vs 2 convs, so agreement
        # is at bf16 rounding level, not f32
        np.testing.assert_allclose(ys["pallas"], ys["ref"], atol=2e-2)
    r, p = out.get("ref"), out.get("pallas")
    msg = f"n{n:3d} {h:4d}px c{c:4d}: ref {r*1e3 if r else -1:7.2f} ms"
    if p and r:
        msg += f"  pallas {p*1e3:7.2f} ms  ({r/p:4.2f}x)"
    elif p:
        msg += f"  pallas {p*1e3:7.2f} ms"
    print(msg, flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    # stylegan3-t 256px layer plan shapes (models/stylegan3.py):
    # early layers are small-res/high-channel, late are big-res/low-channel
    for (n, h, c) in [(16, 36, 256), (16, 36, 512), (16, 52, 512),
                      (16, 84, 512), (8, 148, 323), (8, 276, 181),
                      (16, 16, 1024)]:
        bench(n, h, c)
    check_grad()


def check_grad(n=4, h=36, c=256):
    """custom_vjp: pallas forward must carry ref-path gradients."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(n, h, h, c), jnp.float32)
    b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    fu = setup_filter(np.hanning(12))
    fd = setup_filter(np.hanning(12))

    def loss(impl):
        def f(x, b):
            y = filtered_lrelu(x, fu, fd, b, up=2, down=2, padding=6,
                               impl=impl)
            return jnp.sum(jnp.sin(y))
        return jax.jit(jax.grad(f, argnums=(0, 1)))(x, b)

    gx_p, gb_p = loss("pallas")
    gx_r, gb_r = loss("ref")
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r),
                               atol=2e-2)
    print("grad parity (pallas fwd + ref-AD bwd): OK", flush=True)


if __name__ == "__main__":
    main()
