"""Frechet Inception Distance (parity with reference src/metrics/fid.py).

Moments accumulate on-device in float64-free streaming form; the matrix
sqrt runs on host via scipy (2048x2048, negligible next to feature
extraction) exactly like the reference (fid.py:34-62).
"""

from __future__ import annotations

import numpy as np
from scipy import linalg


def frechet_inception_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """reference fid.py:34-62"""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def compute_moments(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """reference fid.py:65-98 tail: mu/sigma of stacked features."""
    feats = np.asarray(feats, dtype=np.float64)
    mu = np.mean(feats, axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def calculate_fid(real_mu, real_sigma, fake_feats) -> float:
    """reference fid.py:101-136: fake moments from stacked features vs
    cached real moments."""
    mu, sigma = compute_moments(fake_feats)
    return frechet_inception_distance(real_mu, real_sigma, mu, sigma)
