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


_BLOCK = 8192  # row-block size: keeps distance tiles << HBM at 50k feats


def _pad_rows(x: jnp.ndarray, block: int) -> tuple[jnp.ndarray, int]:
    n = x.shape[0]
    pad = (-n) % block
    if pad:
        x = jnp.concatenate([x, jnp.full((pad, x.shape[1]), jnp.inf,
                                         x.dtype)], axis=0)
    return x, n


@functools.partial(jax.jit, static_argnums=(1, 2))
def _kth_radii(x: jnp.ndarray, k: int = 5, block: int = _BLOCK) -> jnp.ndarray:
    """Distance to the k-th nearest neighbour (excluding self), computed
    in row blocks; reference prdc.py:34-49 with k=nearest_k."""
    n = x.shape[0]
    xp, _ = _pad_rows(x, min(block, max(n, 1)))
    blocks = xp.reshape(-1, min(block, max(n, 1)), x.shape[1])

    def per_block(q):
        d = _pairwise_dist(q, x)          # (b, n)
        return -jax.lax.top_k(-d, k + 1)[0][:, k]

    radii = jax.lax.map(per_block, blocks).reshape(-1)
    return radii[:n]


def compute_prdc(real_features, fake_features, nearest_k: int = 5) -> dict:
    """reference prdc.py:129-168 — identical math, row-blocked so 50k-scale
    feature sets never materialize the full NxN distance matrix."""
    real = jnp.asarray(real_features, jnp.float32)
    fake = jnp.asarray(fake_features, jnp.float32)
    nr, nf = real.shape[0], fake.shape[0]
    real_radii = _kth_radii(real, nearest_k)
    fake_radii = _kth_radii(fake, nearest_k)

    block = min(_BLOCK, max(nr, 1))
    rp, _ = _pad_rows(real, block)
    rr_p = jnp.concatenate(
        [real_radii, jnp.full(((-nr) % block,), -jnp.inf)])  # pad rows match nothing

    @jax.jit
    def scan_real_blocks():
        r_blocks = rp.reshape(-1, block, real.shape[1])
        rad_blocks = rr_p.reshape(-1, block)

        def per_block(args):
            rb, radb = args
            d = _pairwise_dist(rb, fake)                 # (b, nf)
            within = d < radb[:, None]
            hit_any = within.any(axis=0)                 # fake inside this block's real balls
            counts = jnp.sum(within, axis=0)             # per-fake containment count
            nearest = jnp.min(d, axis=1)                 # per-real nearest fake
            covered = (nearest < radb) & jnp.isfinite(radb)
            # recall term: real i inside ANY fake ball (reference prdc.py:152)
            recalled = (d < fake_radii[None, :]).any(axis=1) & jnp.isfinite(radb)
            return hit_any, counts, covered, recalled

        hits, counts, covered, recalled = jax.lax.map(
            per_block, (r_blocks, rad_blocks))
        return (hits.any(axis=0), counts.sum(axis=0),
                covered.reshape(-1)[:nr], recalled.reshape(-1)[:nr])

    hit_any, counts, covered, recalled = scan_real_blocks()
    precision = float(jnp.mean(hit_any))
    density = float(jnp.mean(counts / nearest_k))
    coverage = float(jnp.mean(covered))
    recall = float(jnp.mean(recalled))
    return dict(precision=precision, recall=recall, density=density,
                coverage=coverage)


def calculate_pr_dc(real_feats, fake_feats, nearest_k: int = 5) -> dict:
    """reference prdc.py:65-126 wrapper."""
    n = min(len(real_feats), len(fake_feats))
    return compute_prdc(np.asarray(real_feats)[:n], np.asarray(fake_feats)[:n],
                        nearest_k)
