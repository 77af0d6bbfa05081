"""Inception Score (parity with reference src/metrics/ins.py)."""

from __future__ import annotations

import numpy as np


def calculate_kl_div(ps: np.ndarray, splits: int) -> tuple[float, float]:
    """reference ins.py:28-42: IS over `splits` chunks."""
    ps = np.asarray(ps, dtype=np.float64)
    n = ps.shape[0]
    scores = []
    for i in range(splits):
        part = ps[(i * n) // splits:((i + 1) * n) // splits]
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(py + 1e-12))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


_IMAGENET_SUBSETS = ("Baby_ImageNet", "Papa_ImageNet", "Grandpa_ImageNet")


def eval_features(probs: np.ndarray, labels: np.ndarray | None, splits: int,
                  is_acc: bool = False, data_name: str | None = None,
                  classes: list[str] | None = None,
                  is_torch_backbone: bool = True):
    """reference ins.py:45-79: IS + optional top1/top5 vs true labels.

    ``classes`` is the dataset's folder(WNID) list in label order; with
    it, dataset labels are remapped into the backbone's class space via
    the bundled folder-label tables (reference misc.py:582-595):

      * torch backbones, full ImageNet: folder order == torchvision
        order, labels used directly;
      * torch backbones, Baby/Papa/Grandpa subsets: WNID -> 0..999;
      * InceptionV3_tf (1008 logits, logit 0 = background): WNID -> TF
        order; full-set accuracy reads logits 1..1000, subsets 0..1000
        with +1-shifted labels (reference ins.py:67-76)."""
    is_score, is_std = calculate_kl_div(probs, splits)
    top1 = top5 = "N/A"
    if is_acc and labels is not None:
        labels = np.asarray(labels)
        subset = data_name in _IMAGENET_SUBSETS
        if classes is None and (subset or not is_torch_backbone):
            # a remap is REQUIRED here (reference misc.py:582-595) —
            # proceeding with raw dataset labels would produce quietly
            # wrong top1/top5 (e.g. HDF5/in-memory loads that lost the
            # folder list).  Fail loudly instead.
            raise ValueError(
                f"top1/top5 for data_name={data_name!r} with "
                f"is_torch_backbone={is_torch_backbone} needs the dataset's "
                "folder list to remap labels into the backbone's class "
                "space, but `classes` is None (HDF5/in-memory datasets: "
                "re-pack with a recent studiogan_tpu so the folder list is "
                "stored, or pass -metrics without is_acc).")
        if classes is not None and (subset or not is_torch_backbone):
            from studiogan_tpu.utils.imagenet_labels import (
                load_imagenet_folder_label_dict)
            table = load_imagenet_folder_label_dict(data_name or "ImageNet",
                                                    is_torch_backbone)
            conv = np.asarray([table[classes[int(l)]] for l in labels])
        else:
            conv = labels
        if is_torch_backbone:
            scores, y = probs, conv
        elif subset:
            scores, y = probs[:, 0:1001], conv + 1
        else:
            scores, y = probs[:, 1:1001], conv
        order = np.argsort(-np.asarray(scores), axis=1)
        top1 = float(np.mean(order[:, 0] == y))
        top5 = float(np.mean((order[:, :5] == y[:, None]).any(axis=1)))
    return is_score, is_std, top1, top5
