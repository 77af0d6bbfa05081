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
    b = jnp.asarray(rng.randn(1, c) * 0.1, jnp.float32)
    fu = setup_filter(np.hanning(taps))
    fd = setup_filter(np.hanning(taps))
    pad = taps // 2

    out = {}
    for impl in ("ref", "pallas"):
        f = jax.jit(lambda x, b: filtered_lrelu(
            x, fu, fd, b, up=up, down=down, padding=pad, impl=impl))
        try:
            y = f(x, b)
            float(y.ravel()[0])
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
    r, p = out.get("ref"), out.get("pallas")
    msg = f"n{n:3d} {h:4d}px c{c:4d}: ref {r*1e3 if r else -1:7.2f} ms"
    if p:
        msg += f"  pallas {p*1e3:7.2f} ms  ({r/p:4.2f}x)"
    print(msg, flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    # stylegan3-t 256px layer plan shapes (models/stylegan3.py):
    # early layers are small-res/high-channel, late are big-res/low-channel
    for (n, h, c) in [(16, 36, 256), (16, 36, 512), (16, 52, 512),
                      (16, 84, 512), (8, 148, 323), (8, 276, 181),
                      (16, 16, 1024)]:
        bench(n, h, c)
