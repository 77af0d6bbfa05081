"""Datasets (parity with reference src/data_util.py).

Backends:
  * CIFAR10/CIFAR100 — the standard python-pickle batches in
    ``data_dir`` (the reference auto-downloads via torchvision; this
    environment has no egress, so the files must be on disk);
  * ImageFolder — ``data_dir/{train,valid}/<class>/<img>`` layout;
  * HDF5 — the packed uint8 NHWC file from
    :func:`studiogan_tpu.data.hdf5.make_hdf5`, optionally fully
    in-memory;
  * synthetic — deterministic random images, for tests/benches.

Images come out as uint8 NHWC; normalization to [-1, 1], random flip,
and batching live in the pipeline (pipeline.py) so the dataset stays a
cheap random-access store.
"""

from __future__ import annotations

import os
import pickle
import tarfile
from pathlib import Path

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".webp")

RESIZER_FILTERS = {  # reference data_util.py:22-27
    "nearest": "NEAREST", "bilinear": "BILINEAR", "bicubic": "BICUBIC",
    "lanczos": "LANCZOS",
}


def center_crop_long_edge(img):
    """reference data_util.py:46-56"""
    from PIL import Image
    w, h = img.size
    size = min(w, h)
    left, top = (w - size) // 2, (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def random_crop_long_edge(img, rng: np.random.RandomState):
    """reference data_util.py:29-43"""
    w, h = img.size
    size = min(w, h)
    left = 0 if w == size else rng.randint(0, w - size + 1)
    top = 0 if h == size else rng.randint(0, h - size + 1)
    return img.crop((left, top, left + size, top + size))


class Dataset_:
    """Random-access (image uint8 HWC, label int) store."""

    def __init__(self, data_name: str, data_dir: str | None, train: bool,
                 crop_long_edge: bool = False, resize_size: int | None = None,
                 resizer: str = "lanczos", random_flip: bool = False,
                 hdf5_path: str | None = None, load_data_in_memory: bool = False,
                 synthetic_size: int | None = None, num_classes: int = 10,
                 img_size: int = 32):
        self.data_name = data_name
        self.train = train
        self.crop_long_edge = crop_long_edge
        self.resize_size = resize_size
        self.resizer = resizer
        self.random_flip = random_flip  # applied in the pipeline
        self.num_classes = num_classes

        if synthetic_size is not None or data_name == "SYNTHETIC":
            n = synthetic_size or 1024
            rng = np.random.RandomState(0 if train else 1)
            self._images = rng.randint(0, 256, (n, img_size, img_size, 3),
                                       dtype=np.uint8)
            self._labels = rng.randint(0, num_classes, (n,)).astype(np.int64)
            self._mode = "memory"
        elif hdf5_path is not None:
            import h5py
            self._h5_path = hdf5_path
            with h5py.File(hdf5_path, "r") as f:
                self._len = len(f["labels"])
                self.num_classes = int(f["labels"][:].max()) + 1
                if "classes" in f:   # folder list persisted by hdf5.make_hdf5
                    self.classes = [c.decode() for c in f["classes"][:]]
                if load_data_in_memory:
                    self._images = f["imgs"][:]
                    self._labels = f["labels"][:]
            self._mode = "memory" if load_data_in_memory else "hdf5"
            self._h5 = None
        elif data_name in ("CIFAR10", "CIFAR100"):
            self._images, self._labels = _load_cifar(data_name, data_dir, train)
            self.num_classes = 10 if data_name == "CIFAR10" else 100
            self._mode = "memory"
        else:  # ImageFolder
            root = Path(data_dir) / ("train" if train else "valid")
            if not root.exists():
                root = Path(data_dir)
            self._paths, self._labels, self.classes = _scan_image_folder(root)
            self.num_classes = len(self.classes)
            self._mode = "folder"

    def __len__(self):
        if self._mode == "hdf5":
            return self._len
        if self._mode == "folder":
            return len(self._paths)
        return len(self._images)

    def __getitem__(self, idx: int) -> tuple[np.ndarray, int]:
        if self._mode == "memory":
            return self._images[idx], int(self._labels[idx])
        if self._mode == "hdf5":
            import h5py
            if self._h5 is None:  # lazy per-worker open
                self._h5 = h5py.File(self._h5_path, "r")
            img = self._h5["imgs"][idx]
            if img.shape[0] in (1, 3) and img.shape[-1] not in (1, 3):
                img = np.transpose(img, (1, 2, 0))  # CHW (reference packing) -> HWC
            return img, int(self._h5["labels"][idx])
        # folder
        from PIL import Image
        img = Image.open(self._paths[idx]).convert("RGB")
        if self.crop_long_edge:
            img = center_crop_long_edge(img)
        if self.resize_size is not None and self.resizer != "wo_resize":
            from PIL import Image as I
            filt = getattr(I, RESIZER_FILTERS.get(self.resizer, "LANCZOS"))
            img = img.resize((self.resize_size, self.resize_size), filt)
        return np.asarray(img, dtype=np.uint8), int(self._labels[idx])


def _load_cifar(name: str, data_dir: str | None, train: bool):
    base = Path(data_dir or "./data")
    folder = "cifar-10-batches-py" if name == "CIFAR10" else "cifar-100-python"
    root = base / folder
    if not root.exists():
        tgz = base / (folder + ".tar.gz")
        alt = base / ("cifar-10-python.tar.gz" if name == "CIFAR10" else
                      "cifar-100-python.tar.gz")
        for t in (tgz, alt):
            if t.exists():
                with tarfile.open(t) as tf:
                    tf.extractall(base, filter="data")
                break
    if not root.exists():
        # first run on a machine WITH internet: auto-download like the
        # reference (data_util.py:113-121 torchvision download=True);
        # md5-checked, atomic extract.  Zero-egress machines fall
        # through to the FileNotFoundError below.
        _download_cifar(name, base)
    if not root.exists():
        raise FileNotFoundError(
            f"{name} not found under {base} and auto-download failed "
            f"(no-egress environment?): place the python-pickle batches "
            f"there, or use a SYNTHETIC/HDF5 dataset)")
    imgs, labels = [], []
    if name == "CIFAR10":
        files = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
        label_key = b"labels"
    else:
        files = ["train"] if train else ["test"]
        label_key = b"fine_labels"
    for fn in files:
        with open(root / fn, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        imgs.append(d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))
        labels.extend(d[label_key])
    return np.concatenate(imgs), np.asarray(labels, dtype=np.int64)


_CIFAR_URLS = {
    # canonical hosts + md5s, matching torchvision.datasets.CIFAR10/100
    "CIFAR10": ("https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz",
                "c58f30108f718f92721af3b95e74349a"),
    "CIFAR100": ("https://www.cs.toronto.edu/~kriz/cifar-100-python.tar.gz",
                 "eb9058c3a382ffc7106e4002c42a8d85"),
}


def _download_cifar(name: str, base: Path) -> None:
    """Best-effort auto-download (reference data_util.py:113-121).
    Failures are logged, never raised — the caller re-checks the dir."""
    import hashlib
    import logging
    import urllib.request

    url, md5 = _CIFAR_URLS[name]
    base.mkdir(parents=True, exist_ok=True)
    tgz = base / url.rsplit("/", 1)[1]
    tmp = str(tgz) + ".part"
    try:
        logging.getLogger("studiogan_tpu").info(
            "Downloading %s from %s ...", name, url)
        urllib.request.urlretrieve(url, tmp)  # noqa: S310 - fixed https URL
        digest = hashlib.md5(open(tmp, "rb").read()).hexdigest()  # noqa: S324
        if digest != md5:
            raise OSError(f"md5 mismatch: {digest} != {md5}")
        os.replace(tmp, tgz)
        with tarfile.open(tgz) as tf:
            tf.extractall(base, filter="data")
    except Exception as e:  # noqa: BLE001 - offline is an expected case
        logging.getLogger("studiogan_tpu").warning(
            "%s auto-download failed (%s); falling back to local files", name, e)
        if os.path.exists(tmp):
            os.remove(tmp)


def _scan_image_folder(root: Path):
    classes = sorted(p.name for p in root.iterdir() if p.is_dir())
    cls_to_idx = {c: i for i, c in enumerate(classes)}
    paths, labels = [], []
    for c in classes:
        for p in sorted((root / c).rglob("*")):
            if p.suffix.lower() in IMG_EXTENSIONS:
                paths.append(str(p))
                labels.append(cls_to_idx[c])
    return paths, np.asarray(labels, dtype=np.int64), classes
