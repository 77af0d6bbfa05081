"""Decompose the StyleGAN2-D2DCE-DiffAug CIFAR step cost on the chip.

python scripts/profile_stylegan2.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(label, fn, *args, iters=30, sync=None):
    out = fn(*args)
    (sync or (lambda o: float(jax.tree.leaves(o)[0].ravel()[0])))(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        (sync or (lambda o: float(jax.tree.leaves(o)[0].ravel()[0])))(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label:42s} {best*1e3:8.2f} ms", flush=True)
    return best


def main():
    from studiogan_tpu.config import Configurations
    from studiogan_tpu.models import build_discriminator, build_generator
    from studiogan_tpu.train import TrainEngine

    print(f"devices: {jax.devices()}", flush=True)
    cfg = Configurations(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "CIFAR10", "StyleGAN2-D2DCE-DiffAug.yaml"))
    cfg.RUN.train = True
    cfg.finalize()
    O = cfg.OPTIMIZATION
    G, D = build_generator(cfg), build_discriminator(cfg)
    eng = TrainEngine(cfg, G, D)
    state = eng.init_state(jax.random.PRNGKey(0))
    B = O.batch_size
    rng = np.random.RandomState(0)
    n_micro = O.d_updates_per_step * O.acml_steps
    imgs = jnp.asarray(rng.uniform(-1, 1, (n_micro, B, 32, 32, 3)), jnp.float32)
    labs = jnp.asarray(rng.randint(0, 10, (n_micro, B)), jnp.int32)
    z = jnp.asarray(rng.randn(B, cfg.MODEL.z_dim), jnp.float32)
    y = labs[0]
    x1 = imgs[0]

    # full step
    step = jax.jit(eng.train_step)
    timed("full step (2 D + 1 G + lazy R1 cond)", step, state, imgs, labs,
          iters=16, sync=lambda o: float(o[1]["d_loss"]))

    # G forward (train mode, style mixing 0)
    gfwd = jax.jit(lambda st, z, y: eng._g_apply(
        st.g_params, st.g_state, z, y, rng=jax.random.PRNGKey(1))[0])
    timed("G forward bs64", gfwd, state, z, y)

    # D forward
    dfwd = jax.jit(lambda st, x, y: eng._d_apply(
        st.d_params, st.d_state, x, y)[0]["adv_output"])
    timed("D forward bs64", dfwd, state, x1, y)

    # D loss grad (one micro, incl. G fwd for fakes + both D fwd + diffaug)
    def d_micro(st, x, y):
        fakes = eng._sample_fakes(st.g_params, st.g_state, st.d_params,
                                  st.d_state, jax.random.PRNGKey(2), B, False)
        (loss, aux), grads = jax.value_and_grad(eng._d_loss_fn, has_aux=True)(
            st.d_params, st.d_state, x, y, fakes, jax.random.PRNGKey(3),
            st.step, st.ada_p, st.lecam, jnp.asarray(0.0))
        return loss
    timed("D micro grad (no R1)", jax.jit(d_micro), state, x1, y,
          sync=lambda o: float(o))

    # G loss grad
    def g_micro(st, x, y):
        (loss, aux), grads = jax.value_and_grad(
            eng._g_loss_fn, has_aux=True)(
                st.g_params, None, st.g_state, st.d_params, st.d_state,
                (x, y), jax.random.PRNGKey(4), st.step, st.ada_p, st.topk)
        return loss
    timed("G micro grad", jax.jit(g_micro), state, x1, y,
          sync=lambda o: float(o))

    # lazy R1 step alone
    r1 = jax.jit(lambda st, mi, ml: eng._lazy_r1_step(st, mi, ml))
    timed("lazy R1 optimizer step", r1, state, imgs[:1], labs[:1], iters=8,
          sync=lambda o: float(jax.tree.leaves(o.d_params)[0].ravel()[0]))

    # mapping alone
    mapping = jax.jit(lambda st, z, y: eng.G.apply(
        {"params": st.g_params, **st.g_state}, z, y,
        method=eng.G.run_mapping))
    timed("mapping network bs64", mapping, state, z, y)


if __name__ == "__main__":
    main()
