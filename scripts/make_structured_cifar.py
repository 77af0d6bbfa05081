"""Synthesize a STRUCTURED CIFAR-10 drop (canonical pickle batches).

Writes data_batch_{1..5} + test_batch in the byte-exact layout the real
CIFAR-10 archive uses (reference src/data_util.py:113-121 loads it via
torchvision; our studiogan_tpu/data/datasets.py:_load_cifar reads the
pickles directly), but with *learnable structured content* instead of
photographs — each class k has:

  * a class-anchored base color (palette[k]),
  * an oriented sinusoidal grating (angle = 18 deg * k, random phase),
  * a bright patch whose position is class-correlated,
  * iid pixel noise.

A conditional GAN trained on this must learn per-class color + texture
statistics, so losses/FID-proxy trending on this drop is real evidence
of adversarial learning dynamics end-to-end through the on-disk CIFAR
ingestion path (round-3 verdict item 4: a convergence run, and the
first full-scale exercise of the real-data code path in this
egress-less environment).

Usage: python scripts/make_structured_cifar.py <out_data_dir> [n_train]
"""
from __future__ import annotations

import os
import pickle
import sys

import numpy as np

PALETTE = np.array(
    [[220, 60, 60], [60, 220, 60], [60, 60, 220], [220, 220, 60],
     [220, 60, 220], [60, 220, 220], [230, 140, 40], [140, 40, 230],
     [40, 230, 140], [128, 128, 128]], np.float32)


def make_images(labels: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    n = len(labels)
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32) / 32.0
    imgs = np.empty((n, 32, 32, 3), np.float32)
    for i, k in enumerate(labels):
        ang = np.pi * k / 10.0
        phase = rng.uniform(0, 2 * np.pi)
        freq = 4.0 + (k % 3)
        grating = np.sin(2 * np.pi * freq * (np.cos(ang) * xx
                                             + np.sin(ang) * yy) + phase)
        img = PALETTE[k][None, None] * (0.75 + 0.25 * grating[..., None])
        # class-correlated bright patch (position jittered per image)
        cy = int(6 + 2 * (k % 5) + rng.randint(-2, 3))
        cx = int(6 + 2 * (k // 5) * 5 + rng.randint(-2, 3)) % 26
        img[cy:cy + 6, cx:cx + 6] = 255.0 - 0.5 * img[cy:cy + 6, cx:cx + 6]
        img += rng.normal(0, 12.0, img.shape)
        imgs[i] = img
    return np.clip(imgs, 0, 255).astype(np.uint8)


def main():
    out = sys.argv[1]
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    root = os.path.join(out, "cifar-10-batches-py")
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(2026)
    per = n_train // 5
    for b in range(1, 7):
        n = per if b <= 5 else max(per // 5, 100)
        labels = rng.randint(0, 10, (n,))
        imgs = make_images(labels, rng)
        # canonical layout: row-major CHW flattened uint8 rows
        data = imgs.transpose(0, 3, 1, 2).reshape(n, -1)
        name = f"data_batch_{b}" if b <= 5 else "test_batch"
        with open(os.path.join(root, name), "wb") as f:
            pickle.dump({b"data": data, b"labels": labels.tolist()}, f)
        print(f"{name}: {n} images")
    with open(os.path.join(root, "batches.meta"), "wb") as f:
        pickle.dump({b"label_names": [f"class_{i}".encode()
                                      for i in range(10)]}, f)
    print(f"structured CIFAR-10 drop -> {root}")


if __name__ == "__main__":
    main()
