"""One-time HDF5 packing (parity with reference src/utils/hdf5.py:35-97).

Packs the train split to ``{name}_{size}_{resizer}_train.hdf5`` as uint8
NHWC with chunked layout for fast sequential + random reads.
"""

from __future__ import annotations

import os

import numpy as np


def make_hdf5(dataset, data_name: str, img_size: int, resizer: str,
              save_dir: str, chunk: int = 500) -> str:
    import h5py

    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, f"{data_name}_{img_size}_{resizer}_train.hdf5")
    if os.path.exists(path):
        return path
    n = len(dataset)
    tmp = path + ".tmp"
    with h5py.File(tmp, "w") as f:
        imgs = f.create_dataset("imgs", (n, img_size, img_size, 3), dtype="uint8",
                                chunks=(min(chunk, n), img_size, img_size, 3))
        labels = f.create_dataset("labels", (n,), dtype="int64")
        # persist the folder(WNID) list so top1/top5 label remapping
        # (metrics/ins.py eval_features) survives the HDF5 round-trip
        src_classes = getattr(dataset, "classes", None)
        if src_classes:
            f.create_dataset(
                "classes", data=np.asarray(src_classes, dtype="S"))
        for i in range(n):
            img, lab = dataset[i]
            if img.shape[:2] != (img_size, img_size):
                from PIL import Image
                img = np.asarray(
                    Image.fromarray(img).resize((img_size, img_size),
                                                Image.LANCZOS))
            imgs[i] = img
            labels[i] = lab
    os.replace(tmp, path)
    return path
