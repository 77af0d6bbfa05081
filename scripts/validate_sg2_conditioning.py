"""StyleGAN2 conditioning-strength validation (VERDICT r1 weak #7).

Trains the real CIFAR-scale StyleGAN2-ADA cifar recipe (cAdaIN + SPD,
configs/CIFAR10/StyleGAN2.yaml) on structured synthetic data where the
class label determines channel-0 brightness, then measures how well
class-conditional generation reproduces the per-class brightness:

    err(k) = | mean_c0(G(z, y=k)) - mu_k |,   mu_k = 2k/(K-1) - 1

A conditioning-blind generator sits at err ~= mean_k |mu_k - mean(mu)|
(~0.5 for K=10); a conditioned one drives err toward the noise floor.

Run on the TPU chip:  python scripts/validate_sg2_conditioning.py
(env STUDIOGAN_SG2_STEPS to override the step budget).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from studiogan_tpu.config import Configurations
from studiogan_tpu.models import build_discriminator, build_generator
from studiogan_tpu.train import TrainEngine

K = 10
CHUNK = 50


def class_means(k: int = K) -> np.ndarray:
    return (2.0 * np.arange(k) / (k - 1) - 1.0).astype(np.float32)


def make_basket_chunk(rng: np.random.RandomState, n_steps: int, n_micro: int,
                      batch: int, img: int):
    """Structured data: channel 0 = class brightness + texture; channels
    1/2 = shared texture.  (n_steps, n_micro, B, H, W, C) float32."""
    mus = class_means()
    labels = rng.randint(0, K, (n_steps, n_micro, batch)).astype(np.int32)
    base = rng.uniform(-0.25, 0.25,
                       (n_steps, n_micro, batch, img, img, 3)).astype(np.float32)
    base[..., 0] = 0.5 * base[..., 0] + mus[labels][..., None, None]
    return np.clip(base, -1, 1), labels


_GEN = None


def cond_error(eng, state, n_draws: int = 8) -> float:
    """One jitted ascending-label batch (8 samples/class) x n_draws."""
    global _GEN
    if _GEN is None:
        _GEN = jax.jit(lambda st, k: eng.generate(
            st, k, 8 * K, y_sampler="ascending_all"))
    mus = class_means()
    per_class = np.zeros(K)
    for d in range(n_draws):
        imgs, labels = _GEN(state, jax.random.PRNGKey(1234 + d))
        imgs, labels = np.asarray(imgs), np.asarray(labels)
        for k in range(K):
            per_class[k] += imgs[labels == k, :, :, 0].mean() / n_draws
    return float(np.mean(np.abs(per_class - mus)))


def main():
    total = int(os.environ.get("STUDIOGAN_SG2_STEPS", 3000))
    cfg = Configurations(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "CIFAR10", "StyleGAN2.yaml"))
    cfg.OPTIMIZATION.batch_size = 64
    cfg.OPTIMIZATION.total_steps = total
    cfg.RUN.train = True
    cfg.finalize()

    G, D = build_generator(cfg), build_discriminator(cfg)
    eng = TrainEngine(cfg, G, D)
    state = eng.init_state(jax.random.PRNGKey(0))
    steps_fn = jax.jit(eng.train_steps, donate_argnums=0)

    O = cfg.OPTIMIZATION
    n_micro = O.d_updates_per_step * O.acml_steps
    rng = np.random.RandomState(0)

    print(f"cond_err@0: {cond_error(eng, state):.4f} (blind ~0.5)", flush=True)
    t0 = time.time()
    for start in range(0, total, CHUNK):
        imgs, labs = make_basket_chunk(rng, CHUNK, n_micro,
                                       O.batch_size, cfg.DATA.img_size)
        state, metrics = steps_fn(state, jnp.asarray(imgs), jnp.asarray(labs))
        if (start + CHUNK) % 500 == 0:
            err = cond_error(eng, state)
            rate = (start + CHUNK) / (time.time() - t0)
            print(f"step {start + CHUNK}: cond_err={err:.4f} "
                  f"d_loss={float(np.asarray(metrics['d_loss']).ravel()[-1]):.3f} "
                  f"g_loss={float(np.asarray(metrics['g_loss']).ravel()[-1]):.3f} "
                  f"({rate:.1f} steps/s)", flush=True)
    final = cond_error(eng, state)
    print(f"FINAL cond_err after {total} steps: {final:.4f}")
    assert np.isfinite(final)


if __name__ == "__main__":
    main()
