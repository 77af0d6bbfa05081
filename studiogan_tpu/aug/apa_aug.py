"""Adaptive Pseudo Augmentation (parity with reference src/utils/apa_aug.py):
replace real batch entries with detached fakes with probability apa_p."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def apply_apa_aug(rng: Array, real_images: Array, fake_images: Array,
                  apa_p: Array) -> Array:
    n = real_images.shape[0]
    flag = (jax.random.uniform(rng, (n, 1, 1, 1)) < apa_p).astype(real_images.dtype)
    fake = jax.lax.stop_gradient(fake_images)
    return fake * flag + real_images * (1.0 - flag)
