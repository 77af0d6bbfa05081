"""ImageNet folder(WNID) -> classifier-class-index mappings for top1/top5
accuracy during evaluation (parity with reference
src/utils/misc.py:582-595 ``load_ImageNet_label_dict``).

Two public data tables ship under ``imagenet_meta/`` (same files the
reference bundles in src/utils/):

  * ``pytorch_imagenet_folder_label_pairs.json`` — WNID -> torchvision
    1000-class index (used for the *_torch backbones when the dataset is
    a subset like Baby/Papa/Grandpa_ImageNet, whose folder order differs
    from the full-ImageNet order).
  * ``tf_imagenet_folder_label_pairs.txt`` — WNID -> TF-slim class order
    (used for the 1008-logit InceptionV3_tf backbone; its logit 0 is the
    background class, handled in metrics/ins.py).
"""

from __future__ import annotations

import json
import os

_META = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "imagenet_meta")
_SUBSETS = ("Baby_ImageNet", "Papa_ImageNet", "Grandpa_ImageNet")


def load_imagenet_folder_label_dict(data_name: str,
                                    is_torch_backbone: bool) -> dict:
    """{WNID: class index} in the evaluated backbone's label space
    (reference misc.py:582-595)."""
    if data_name in _SUBSETS and is_torch_backbone:
        with open(os.path.join(
                _META, "pytorch_imagenet_folder_label_pairs.json")) as f:
            return json.load(f)
    table = {}
    with open(os.path.join(_META, "tf_imagenet_folder_label_pairs.txt")) as f:
        for label, line in enumerate(f):
            line = line.strip()
            if line:
                table[line.split(" ")[0]] = label
    return table
