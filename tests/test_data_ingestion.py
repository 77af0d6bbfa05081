"""On-disk ingestion paths exercised with synthesized real-format files.

The environment has no real CIFAR/ImageNet drops, so these tests write
byte-faithful stand-ins — CIFAR python-pickle batches (the exact format
torchvision's CIFAR10/CIFAR100 readers consume, reference
src/data_util.py:113-116), a .tar.gz of those batches, an
ImageFolder train/valid PNG tree (reference data_util.py:117-121) —
and run the real loaders end to end over them.
"""

import pickle
import tarfile

import numpy as np
import pytest

from studiogan_tpu.data import BasketLoader, Dataset_
from studiogan_tpu.data.hdf5 import make_hdf5


def _write_cifar10(base, n_per_batch=40, seed=0):
    """data_batch_{1..5} + test_batch in the canonical pickle layout:
    d[b"data"] uint8 (N, 3072) channel-major, d[b"labels"] list[int]."""
    root = base / "cifar-10-batches-py"
    root.mkdir(parents=True)
    rng = np.random.RandomState(seed)
    all_imgs, all_labels = [], []
    for i in range(1, 7):
        imgs = rng.randint(0, 256, (n_per_batch, 3, 32, 32), dtype=np.uint8)
        labels = rng.randint(0, 10, (n_per_batch,)).tolist()
        name = f"data_batch_{i}" if i <= 5 else "test_batch"
        with open(root / name, "wb") as f:
            pickle.dump({b"data": imgs.reshape(n_per_batch, -1),
                         b"labels": labels, b"filenames": []}, f)
        if i <= 5:
            all_imgs.append(imgs.transpose(0, 2, 3, 1))
            all_labels.extend(labels)
    return np.concatenate(all_imgs), np.asarray(all_labels)


def _write_image_folder(base, classes=("cat", "dog", "emu"), n_per_class=6,
                        hw=(48, 32), split="train", seed=0):
    """Non-square PNGs so crop_long_edge + resize actually do work."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    root = base / split
    for c in classes:
        (root / c).mkdir(parents=True)
        for i in range(n_per_class):
            arr = rng.randint(0, 256, (*hw, 3), dtype=np.uint8)
            Image.fromarray(arr).save(root / c / f"{c}_{i:03d}.png")
    return root


class TestCIFARPickles:
    def test_train_split_matches_written_bytes(self, tmp_path):
        ref_imgs, ref_labels = _write_cifar10(tmp_path)
        ds = Dataset_("CIFAR10", str(tmp_path), train=True)
        assert len(ds) == 200 and ds.num_classes == 10
        np.testing.assert_array_equal(ds._images, ref_imgs)
        np.testing.assert_array_equal(ds._labels, ref_labels)
        img, lab = ds[7]
        assert img.dtype == np.uint8 and img.shape == (32, 32, 3)
        assert lab == int(ref_labels[7])

    def test_test_split(self, tmp_path):
        _write_cifar10(tmp_path)
        ds = Dataset_("CIFAR10", str(tmp_path), train=False)
        assert len(ds) == 40

    def test_targz_auto_extract(self, tmp_path):
        staging = tmp_path / "staging"
        ref_imgs, _ = _write_cifar10(staging)
        data_dir = tmp_path / "drop"
        data_dir.mkdir()
        with tarfile.open(data_dir / "cifar-10-python.tar.gz", "w:gz") as tf:
            tf.add(staging / "cifar-10-batches-py",
                   arcname="cifar-10-batches-py")
        ds = Dataset_("CIFAR10", str(data_dir), train=True)
        assert len(ds) == 200
        np.testing.assert_array_equal(ds._images, ref_imgs)

    def test_auto_download_path(self, tmp_path, monkeypatch):
        """First-run auto-download (reference data_util.py:113-121):
        a faked urlretrieve 'serves' the canonical tar.gz, the md5 gate
        accepts it, and ingestion proceeds; a failing download degrades
        to the FileNotFoundError, never crashes."""
        import hashlib

        from studiogan_tpu.data import datasets as ds_mod

        staging = tmp_path / "staging"
        ref_imgs, _ = _write_cifar10(staging)
        served = tmp_path / "served.tar.gz"
        with tarfile.open(served, "w:gz") as tf:
            tf.add(staging / "cifar-10-batches-py",
                   arcname="cifar-10-batches-py")
        md5 = hashlib.md5(served.read_bytes()).hexdigest()
        monkeypatch.setitem(
            ds_mod._CIFAR_URLS, "CIFAR10",
            (ds_mod._CIFAR_URLS["CIFAR10"][0], md5))

        import urllib.request

        def fake_retrieve(url, dst):
            assert url.startswith("https://www.cs.toronto.edu/")
            import shutil
            shutil.copy(served, dst)

        monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
        data_dir = tmp_path / "fresh"
        ds = Dataset_("CIFAR10", str(data_dir), train=True)
        assert len(ds) == 200
        np.testing.assert_array_equal(ds._images, ref_imgs)

        # md5 mismatch -> download rejected -> clean FileNotFoundError
        monkeypatch.setitem(
            ds_mod._CIFAR_URLS, "CIFAR10",
            (ds_mod._CIFAR_URLS["CIFAR10"][0], "0" * 32))
        with pytest.raises(FileNotFoundError, match="auto-download failed"):
            Dataset_("CIFAR10", str(tmp_path / "fresh2"), train=True)

    def test_auto_download_loopback_http_to_train_step(self, tmp_path,
                                                       monkeypatch):
        """The FULL fresh-machine path with a REAL HTTP transfer
        (round-4 verdict item 8): a loopback http.server serves a
        synthesized canonical tarball, _download_cifar fetches it over
        the wire, md5-checks, extracts atomically, ingestion reads the
        batches, and a train step runs over a basket built from them —
        download -> extract -> ingest -> one train step, no mocks on the
        transport.  Reference behavior: src/data_util.py:113-121
        (torchvision download=True)."""
        import functools
        import hashlib
        import http.server
        import threading

        from studiogan_tpu.data import datasets as ds_mod

        staging = tmp_path / "staging"
        ref_imgs, ref_labels = _write_cifar10(staging)
        serve_root = tmp_path / "www"
        serve_root.mkdir()
        served = serve_root / "cifar-10-python.tar.gz"
        with tarfile.open(served, "w:gz") as tf:
            tf.add(staging / "cifar-10-batches-py",
                   arcname="cifar-10-batches-py")
        md5 = hashlib.md5(served.read_bytes()).hexdigest()

        handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                    directory=str(serve_root))
        httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
        port = httpd.server_address[1]
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        try:
            monkeypatch.setitem(
                ds_mod._CIFAR_URLS, "CIFAR10",
                (f"http://127.0.0.1:{port}/cifar-10-python.tar.gz", md5))
            data_dir = tmp_path / "fresh"
            ds = Dataset_("CIFAR10", str(data_dir), train=True)
        finally:
            httpd.shutdown()
        assert len(ds) == 200
        np.testing.assert_array_equal(ds._images, ref_imgs)
        assert (data_dir / "cifar-10-batches-py" / "data_batch_5").exists()

        # ...and one real train step over the downloaded data
        import jax
        import jax.numpy as jnp

        from studiogan_tpu.config import Configurations
        from studiogan_tpu.models import (build_discriminator,
                                          build_generator)
        from studiogan_tpu.train import TrainEngine

        cfg = Configurations()
        cfg.DATA.name, cfg.DATA.img_size, cfg.DATA.num_classes = \
            "CIFAR10", 32, 10
        cfg.MODEL.backbone = "deep_conv"
        cfg.MODEL.g_cond_mtd = cfg.MODEL.d_cond_mtd = "W/O"
        cfg.MODEL.g_conv_dim = cfg.MODEL.d_conv_dim = 16
        cfg.MODEL.z_dim = 32
        cfg.OPTIMIZATION.batch_size = 8
        cfg.OPTIMIZATION.d_updates_per_step = 1
        cfg.finalize()
        loader = BasketLoader(ds, batch_size=8, basket_multiplier=1,
                              random_flip=True, seed=0, prefetch=1)
        imgs, labels = next(iter(loader))
        loader.close()
        G, D = build_generator(cfg), build_discriminator(cfg)
        eng = TrainEngine(cfg, G, D)
        state = eng.init_state(jax.random.PRNGKey(0))
        state, metrics = jax.jit(eng.train_step)(
            state, jnp.asarray(imgs), jnp.asarray(labels))
        assert int(state.step) == 1
        assert np.isfinite(float(np.asarray(metrics["d_loss"]).ravel()[-1]))

    def test_cifar100_fine_labels(self, tmp_path):
        root = tmp_path / "cifar-100-python"
        root.mkdir(parents=True)
        rng = np.random.RandomState(1)
        for name, n in (("train", 60), ("test", 20)):
            imgs = rng.randint(0, 256, (n, 3072), dtype=np.uint8)
            with open(root / name, "wb") as f:
                pickle.dump({b"data": imgs,
                             b"fine_labels": rng.randint(0, 100, n).tolist(),
                             b"coarse_labels": rng.randint(0, 20, n).tolist()},
                            f)
        ds = Dataset_("CIFAR100", str(tmp_path), train=True)
        assert len(ds) == 60 and ds.num_classes == 100
        assert ds._labels.max() < 100

    def test_missing_drop_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            Dataset_("CIFAR10", str(tmp_path / "nowhere"), train=True)


class TestImageFolder:
    def test_scan_labels_and_decode(self, tmp_path):
        _write_image_folder(tmp_path)
        ds = Dataset_("ImageNet", str(tmp_path), train=True)
        assert len(ds) == 18 and ds.num_classes == 3
        assert ds.classes == ["cat", "dog", "emu"]
        img, lab = ds[0]
        assert img.shape == (48, 32, 3) and img.dtype == np.uint8
        assert lab == 0  # sorted class order: first file is a cat
        assert ds._labels.tolist() == [0] * 6 + [1] * 6 + [2] * 6

    def test_crop_long_edge_and_resize(self, tmp_path):
        _write_image_folder(tmp_path, hw=(70, 50))
        ds = Dataset_("ImageNet", str(tmp_path), train=True,
                      crop_long_edge=True, resize_size=32, resizer="lanczos")
        img, _ = ds[3]
        assert img.shape == (32, 32, 3)

    def test_valid_split_and_flat_fallback(self, tmp_path):
        _write_image_folder(tmp_path, split="valid", n_per_class=2)
        ds = Dataset_("ImageNet", str(tmp_path), train=False)
        assert len(ds) == 6
        # no train/valid subdirs -> treat data_dir itself as the root
        flat = tmp_path / "flat"
        _write_image_folder(flat, split=".", n_per_class=2)
        ds2 = Dataset_("ImageNet", str(flat), train=True)
        assert len(ds2) == 6

    def test_basket_loader_over_folder(self, tmp_path):
        _write_image_folder(tmp_path, n_per_class=8, hw=(32, 32))
        ds = Dataset_("ImageNet", str(tmp_path), train=True)
        loader = BasketLoader(ds, batch_size=4, basket_multiplier=2,
                              random_flip=False, seed=0)
        imgs, labels = loader._make_basket()
        assert imgs.shape == (2, 4, 32, 32, 3)
        assert imgs.dtype == np.float32
        assert imgs.min() >= -1.0 and imgs.max() <= 1.0
        # values must be the exact [-1,1] mapping of the decoded PNGs:
        # the first basket consumed the first 8 indices of the epoch-0 shuffle
        rng = np.random.RandomState(loader.seed + 0)
        order = rng.permutation(len(ds))
        want = np.stack([ds[int(j)][0] for j in order[:8]])
        np.testing.assert_allclose(
            imgs.reshape(8, 32, 32, 3),
            want.astype(np.float32) / 127.5 - 1.0, rtol=0, atol=0)

    def test_basket_loader_raw_uint8_over_folder(self, tmp_path):
        _write_image_folder(tmp_path, n_per_class=8, hw=(32, 32))
        ds = Dataset_("ImageNet", str(tmp_path), train=True)
        loader = BasketLoader(ds, batch_size=4, basket_multiplier=2,
                              random_flip=False, seed=0, raw_uint8=True)
        imgs, labels = loader._make_basket()
        assert imgs.dtype == np.uint8
        assert imgs.shape == (2, 4, 32, 32, 3)


class TestHDF5FromFolder:
    def test_pack_folder_then_train_ingest(self, tmp_path):
        _write_image_folder(tmp_path / "raw", hw=(40, 36), n_per_class=4)
        src = Dataset_("ImageNet", str(tmp_path / "raw"), train=True,
                       crop_long_edge=True, resize_size=16, resizer="lanczos")
        path = make_hdf5(src, "ImageNet", 16, "lanczos", str(tmp_path / "h5"))
        ds = Dataset_("ImageNet", None, train=True, hdf5_path=path)
        assert len(ds) == 12 and ds.num_classes == 3
        img, lab = ds[5]
        src_img, src_lab = src[5]
        np.testing.assert_array_equal(img, src_img)
        assert lab == src_lab
        # in-memory variant bit-identical
        dsm = Dataset_("ImageNet", None, train=True, hdf5_path=path,
                       load_data_in_memory=True)
        np.testing.assert_array_equal(dsm._images[5], src_img)
        # folder(WNID) list survives the HDF5 round-trip, so top1/top5
        # label remapping (metrics/ins.py) keeps working (advisor r3)
        assert ds.classes == src.classes
        assert dsm.classes == src.classes
