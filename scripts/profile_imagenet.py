"""ImageNet-128 BigGAN throughput ablations — find where the 88% of
non-MFU time goes (bench r2: 197 imgs/s/chip = 11.9% MFU at bs64 acml4).

Each variant times the full train step (1 D + 1 G update at effective
batch 256) and prints imgs/s + model-FLOPs MFU so the deltas attribute
time to attention / SN / precision / accumulation / batch size.

Run alone on the TPU chip: python scripts/profile_imagenet.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 133e12


def run_variant(name, batch_size, acml, mpc=False, attn=True, sn=True,
                n_steps=6, windows=2):
    from studiogan_tpu.config import Configurations
    from studiogan_tpu.models import build_discriminator, build_generator
    from studiogan_tpu.train import TrainEngine

    cfg = Configurations(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "ImageNet", "BigGAN2048.yaml"))
    cfg.OPTIMIZATION.batch_size = batch_size
    cfg.OPTIMIZATION.acml_steps = acml
    cfg.RUN.mixed_precision = mpc
    cfg.MODEL.apply_attn = attn
    cfg.MODEL.apply_g_sn = cfg.MODEL.apply_d_sn = sn
    cfg.finalize()
    O = cfg.OPTIMIZATION

    G, D = build_generator(cfg), build_discriminator(cfg)
    eng = TrainEngine(cfg, G, D)
    state = eng.init_state(jax.random.PRNGKey(0))
    n_micro = O.d_updates_per_step * O.acml_steps
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.uniform(-1, 1, (n_micro, batch_size, 128, 128, 3)),
                       jnp.float32)
    labels = jnp.asarray(rng.randint(0, 1000, (n_micro, batch_size)), jnp.int32)
    step = jax.jit(eng.train_step, donate_argnums=0)
    try:
        compiled = step.lower(state, imgs, labels).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception as e:
        print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:200]})",
              flush=True)
        return
    for _ in range(2):
        state, m = step(state, imgs, labels)
        float(m["d_loss"])
    best = 0.0
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, m = step(state, imgs, labels)
        float(m["d_loss"])
        float(jax.tree.leaves(state.g_params)[0].ravel()[0])
        best = max(best, n_steps / (time.perf_counter() - t0))
    eff = batch_size * acml
    print(f"{name:28s} {best*eff:7.1f} imgs/s  {best:6.3f} steps/s  "
          f"{flops/1e12:6.2f} TF/step  MFU {flops*best/PEAK*100:5.1f}%",
          flush=True)


def main():
    run_variant("base bs64 acml4 fp32", 64, 4)
    run_variant("bs64 acml4 bf16", 64, 4, mpc=True)
    run_variant("bs256 acml1 fp32", 256, 1)
    run_variant("bs256 acml1 bf16", 256, 1, mpc=True)
    run_variant("bs64 acml4 no-attn", 64, 4, attn=False)
    run_variant("bs64 acml4 no-sn", 64, 4, sn=False)
    run_variant("bs128 acml2 bf16", 128, 2, mpc=True)


if __name__ == "__main__":
    main()
