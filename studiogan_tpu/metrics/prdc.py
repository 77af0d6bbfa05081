"""Improved precision/recall + density/coverage (parity with reference
src/metrics/prdc.py, the official NaverLabs prdc code).

TPU-native: pairwise distances and k-NN radii run as batched matmuls on
device (the reference uses sklearn pairwise_distances on host,
prdc.py:129-168) — identical math, O(N^2 D) on the MXU instead of CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _pairwise_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distances via the |a|^2 - 2ab + |b|^2 expansion (MXU)."""
    a2 = jnp.sum(a * a, axis=1)[:, None]
    b2 = jnp.sum(b * b, axis=1)[None, :]
    d2 = a2 - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32) + b2
    return jnp.sqrt(jnp.maximum(d2, 0.0))


@functools.partial(jax.jit, static_argnums=1)
def _kth_radii(x: jnp.ndarray, k: int = 5) -> jnp.ndarray:
    """Distance to the k-th nearest neighbour (excluding self);
    reference prdc.py:34-49 with k=nearest_k."""
    d = _pairwise_dist(x, x)
    # kth smallest including self at 0 distance -> index k
    return -jax.lax.top_k(-d, k + 1)[0][:, k]


def compute_prdc(real_features, fake_features, nearest_k: int = 5) -> dict:
    """reference prdc.py:129-168"""
    real = jnp.asarray(real_features, jnp.float32)
    fake = jnp.asarray(fake_features, jnp.float32)
    real_radii = _kth_radii(real, nearest_k)
    fake_radii = _kth_radii(fake, nearest_k)
    d_rf = _pairwise_dist(real, fake)  # (Nr, Nf)

    within_real = d_rf < real_radii[:, None]          # fake j inside real i ball
    precision = float(jnp.mean(within_real.any(axis=0)))
    recall = float(jnp.mean((d_rf < fake_radii[None, :]).any(axis=1)))
    density = float(jnp.mean(jnp.sum(within_real, axis=0) / nearest_k))
    coverage = float(jnp.mean(jnp.min(d_rf, axis=1) < real_radii))
    return dict(precision=precision, recall=recall, density=density,
                coverage=coverage)


def calculate_pr_dc(real_feats, fake_feats, nearest_k: int = 5) -> dict:
    """reference prdc.py:65-126 wrapper."""
    n = min(len(real_feats), len(fake_feats))
    return compute_prdc(np.asarray(real_feats)[:n], np.asarray(fake_feats)[:n],
                        nearest_k)
