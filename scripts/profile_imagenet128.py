"""Decompose the ImageNet-128 BigGAN step cost on the real chip.

Sweeps microbatch/acml/precision, and ablates SN updates + attention to
find where the 11.9% MFU goes.  Timing rule (CLAUDE.md): end every
window with a device->host VALUE fetch.

Usage: python scripts/profile_imagenet128.py [quick|sweep|ablate]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _cfg(batch=64, acml=4, mpc=False, attn=True, sn=True, remat=False):
    from studiogan_tpu.config import Configurations
    cfg = Configurations(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "ImageNet", "BigGAN2048.yaml"))
    cfg.OPTIMIZATION.batch_size = batch
    cfg.OPTIMIZATION.acml_steps = acml
    cfg.RUN.mixed_precision = mpc
    cfg.RUN.remat = remat
    cfg.MODEL.apply_attn = attn
    cfg.MODEL.apply_g_sn = cfg.MODEL.apply_d_sn = sn
    cfg.finalize()
    return cfg


def bench_cfg(cfg, n_steps=6, windows=2, warmup=2, label="", unroll=False):
    from studiogan_tpu.models import build_discriminator, build_generator
    from studiogan_tpu.train import TrainEngine

    O = cfg.OPTIMIZATION
    G, D = build_generator(cfg), build_discriminator(cfg)
    eng = TrainEngine(cfg, G, D, unroll_scans=unroll)
    state = eng.init_state(jax.random.PRNGKey(0))

    n_micro = O.d_updates_per_step * O.acml_steps
    sz = cfg.DATA.img_size
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.uniform(-1, 1, (n_micro, O.batch_size, sz, sz, 3)),
                       jnp.float32)
    labels = jnp.asarray(
        rng.randint(0, cfg.DATA.num_classes, (n_micro, O.batch_size)),
        jnp.int32)

    step = jax.jit(eng.train_step, donate_argnums=0)
    t0 = time.perf_counter()
    compiled = step.lower(state, imgs, labels).compile()
    compile_s = time.perf_counter() - t0
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    hbm_bytes = float(ca.get("bytes accessed", 0.0))

    for _ in range(warmup):
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
    eff = O.batch_size * O.acml_steps
    print(f"{label:42s} {best:7.3f} steps/s  {best*eff:7.1f} imgs/s  "
          f"{flops/1e12:6.2f} TF/step  {flops*best/1e12:6.1f} TF/s  "
          f"hbm {hbm_bytes/1e9:6.2f} GB/step ({hbm_bytes*best/1e9:5.0f} GB/s)"
          f"  compile {compile_s:.0f}s", flush=True)
    return best, flops


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    print(f"devices: {jax.devices()}", flush=True)
    if mode in ("quick", "sweep"):
        bench_cfg(_cfg(64, 4, mpc=False), label="bs64 acml4 fp32 (bench cfg)")
        bench_cfg(_cfg(64, 4, mpc=True), label="bs64 acml4 bf16")
        bench_cfg(_cfg(128, 2, mpc=True), label="bs128 acml2 bf16")
        bench_cfg(_cfg(256, 1, mpc=True), label="bs256 acml1 bf16")
    if mode == "unroll":
        bench_cfg(_cfg(64, 4, mpc=False), unroll=True,
                  label="bs64 acml4 fp32 UNROLLED")
        bench_cfg(_cfg(128, 2, mpc=True), unroll=True,
                  label="bs128 acml2 bf16 UNROLLED")
        bench_cfg(_cfg(128, 2, mpc=False), unroll=True,
                  label="bs128 acml2 fp32 UNROLLED")
    if mode == "sweep":
        bench_cfg(_cfg(128, 2, mpc=False), label="bs128 acml2 fp32")
        bench_cfg(_cfg(256, 1, mpc=False), label="bs256 acml1 fp32")
        bench_cfg(_cfg(512, 1, mpc=True), n_steps=3,
                  label="bs512 acml1 bf16 (ref per-step batch)")
    if mode == "remat":
        bench_cfg(_cfg(256, 1, mpc=True, remat=True), unroll=True,
                  label="bs256 acml1 bf16 REMAT+UNROLL")
        bench_cfg(_cfg(128, 2, mpc=True, remat=True), unroll=True,
                  label="bs128 acml2 bf16 REMAT+UNROLL")
    if mode == "ablate":
        bench_cfg(_cfg(64, 4, mpc=False), label="baseline bs64 acml4 fp32")
        bench_cfg(_cfg(64, 4, mpc=False, sn=False), label="  -SN")
        bench_cfg(_cfg(64, 4, mpc=False, attn=False), label="  -attention")
        bench_cfg(_cfg(64, 4, mpc=False, sn=False, attn=False),
                  label="  -SN -attention")
    if mode == "ablate256":
        # decompose the headline bs256 bf16 step (57% MFU): each ablation's
        # delta attributes its cost; at acml=1/du=1 there are no scans, so
        # cost_analysis flops/bytes are exact
        print(f"measured HBM copy bandwidth: {_hbm_bandwidth():.0f} GB/s",
              flush=True)
        bench_cfg(_cfg(256, 1, mpc=True), label="baseline bs256 acml1 bf16")
        bench_cfg(_cfg(256, 1, mpc=True, sn=False), label="  -SN")
        bench_cfg(_cfg(256, 1, mpc=True, attn=False), label="  -attention")
        bench_cfg(_cfg(256, 1, mpc=True, sn=False, attn=False),
                  label="  -SN -attention")


def _hbm_bandwidth(n=int(512e6 // 4)):
    """Peak sustained HBM bandwidth via a big fused read+write (triad-ish):
    2 arrays read + 1 written per iteration."""
    x = jnp.arange(n, dtype=jnp.float32)
    y = jnp.ones((n,), jnp.float32)

    @jax.jit
    def triad(x, y):
        return x + 1.00001 * y

    z = triad(x, y)
    float(z[0])
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        z = triad(z, y)
        float(z[0])
        dt = time.perf_counter() - t0
        best = max(best, 3 * 4 * n / dt / 1e9)
    return best


if __name__ == "__main__":
    main()
