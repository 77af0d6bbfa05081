"""Data pipeline + end-to-end CLI smoke test (synthetic data, tiny model)."""

import json
import os

import numpy as np
import pytest

from studiogan_tpu.data import BasketLoader, Dataset_


class TestDataset:
    def test_synthetic_roundtrip(self):
        ds = Dataset_("SYNTHETIC", None, train=True, synthetic_size=64,
                      num_classes=10, img_size=32)
        img, lab = ds[0]
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8
        assert 0 <= lab < 10
        assert len(ds) == 64

    def test_basket_loader_shapes_and_range(self):
        ds = Dataset_("SYNTHETIC", None, train=True, synthetic_size=64,
                      num_classes=10, img_size=32)
        loader = BasketLoader(ds, batch_size=8, basket_multiplier=5, seed=3)
        imgs, labels = loader._make_basket()
        assert imgs.shape == (5, 8, 32, 32, 3)
        assert labels.shape == (5, 8)
        assert imgs.min() >= -1.0 and imgs.max() <= 1.0

    def test_epoch_shuffle_covers_dataset(self):
        ds = Dataset_("SYNTHETIC", None, train=True, synthetic_size=40,
                      num_classes=4, img_size=8)
        loader = BasketLoader(ds, batch_size=10, basket_multiplier=1,
                              random_flip=False, seed=0)
        seen = [loader._next_indices(10) for _ in range(4)]
        assert sorted(np.concatenate(seen).tolist()) == list(range(40))

    def test_process_sharding_disjoint(self):
        """DistributedSampler semantics: same seed -> disjoint shards
        covering the dataset (reference loader.py:161-176)."""
        ds = Dataset_("SYNTHETIC", None, train=True, synthetic_size=32,
                      num_classes=4, img_size=8)
        shards = []
        for pi in range(2):
            ld = BasketLoader(ds, batch_size=4, basket_multiplier=1, seed=7,
                              process_index=pi, process_count=2)
            shards.append(ld._next_indices(16))
        all_idx = np.concatenate(shards)
        assert len(set(all_idx.tolist())) == 32

    def test_hdf5_pack_and_read(self, tmp_path):
        from studiogan_tpu.data.hdf5 import make_hdf5
        ds = Dataset_("SYNTHETIC", None, train=True, synthetic_size=16,
                      num_classes=4, img_size=16)
        path = make_hdf5(ds, "SYNTH", 16, "lanczos", str(tmp_path))
        ds2 = Dataset_("SYNTH", None, train=True, hdf5_path=path,
                       load_data_in_memory=True)
        assert len(ds2) == 16
        img, lab = ds2[3]
        np.testing.assert_array_equal(img, ds[3][0])


@pytest.mark.slow
class TestCLI:
    def test_train_smoke(self, tmp_path):
        """3 training steps end-to-end through the CLI: config -> data ->
        SPMD step -> checkpoint -> resume."""
        from studiogan_tpu import main as cli

        cfg_yaml = tmp_path / "tiny.yaml"
        cfg_yaml.write_text("""
DATA:
  name: "CIFAR10"
  img_size: 32
  num_classes: 10
MODEL:
  backbone: "big_resnet"
  g_cond_mtd: "cBN"
  d_cond_mtd: "PD"
  apply_g_sn: True
  apply_d_sn: True
  z_dim: 80
  g_shared_dim: 16
  g_conv_dim: 8
  d_conv_dim: 8
  apply_g_ema: True
  g_ema_decay: 0.999
  g_ema_start: 0
LOSS:
  adv_loss: "hinge"
OPTIMIZATION:
  batch_size: 8
  d_updates_per_step: 2
  total_steps: 3
""")
        argv = ["-t", "-cfg", str(cfg_yaml), "-save", str(tmp_path),
                "--synthetic_data", "-metrics", "none",
                "--print_freq", "1", "--save_freq", "2", "--seed", "11"]
        state = cli.run(argv)
        assert int(state.step) == 3
        ckpts = list((tmp_path / "checkpoints").rglob("model=current*"))
        assert ckpts, "checkpoint written"
        figures = list((tmp_path / "figures").rglob("*.png"))
        assert figures, "sample canvas written"

        # resume from the checkpoint dir and train 1 more step
        ckpt_dir = str(ckpts[0].parent)
        cfg_yaml.write_text(cfg_yaml.read_text().replace(
            "total_steps: 3", "total_steps: 4"))
        state2 = cli.run(argv + ["-ckpt", ckpt_dir])
        assert int(state2.step) == 4

        # the same run under the dp x tp x ZeRO layout (--model_axis 2
        # --fsdp on the 8-device mesh) must train and land on the same
        # step count — the sharding knobs are pure layout
        state3 = cli.run(argv + ["-ckpt", ckpt_dir, "--model_axis", "2",
                                 "--fsdp"])
        assert int(state3.step) == 4

    def test_stats_jsonl_per_step_rows_and_sn_sigmas(self, tmp_path):
        """Chunked dispatch must log print_freq-many per-step loss rows
        per window (reference worker.py:686 accumulates per step) plus
        SN sigma monitoring rows (reference worker.py:745-753); a
        resumed run whose step0 is NOT a print_freq multiple must
        realign and keep logging."""
        from studiogan_tpu import main as cli

        cfg_yaml = tmp_path / "tiny.yaml"
        cfg_yaml.write_text("""
DATA:
  name: "CIFAR10"
  img_size: 32
  num_classes: 10
MODEL:
  backbone: "big_resnet"
  g_cond_mtd: "cBN"
  d_cond_mtd: "PD"
  apply_g_sn: True
  apply_d_sn: True
  z_dim: 80
  g_shared_dim: 16
  g_conv_dim: 8
  d_conv_dim: 8
OPTIMIZATION:
  batch_size: 8
  d_updates_per_step: 1
  total_steps: 3
""")
        argv = ["-t", "-cfg", str(cfg_yaml), "-save", str(tmp_path),
                "--synthetic_data", "-metrics", "none",
                "--print_freq", "2", "--save_freq", "2", "--seed", "5"]
        cli.run(argv)

        def stat_rows():
            rows = []
            for p in (tmp_path / "statistics").rglob("train_stats.jsonl"):
                rows += [json.loads(l) for l in open(p)]
            return rows

        rows = stat_rows()
        loss_steps = {r["step"] for r in rows if "g_loss" in r}
        assert {1, 2} <= loss_steps  # per-step rows, not last-of-chunk
        assert any(k.startswith("Gen/") for r in rows for k in r)
        assert any(k.startswith("Dis/") for r in rows for k in r)

        # resume from step 3 (NOT a multiple of print_freq=2): the first
        # chunk must shorten to realign boundaries
        ckpts = list((tmp_path / "checkpoints").rglob("model=current*"))
        cfg_yaml.write_text(cfg_yaml.read_text().replace(
            "total_steps: 3", "total_steps: 6"))
        cli.run(argv + ["-ckpt", str(ckpts[0].parent)])
        loss_steps = {r["step"] for r in stat_rows() if "g_loss" in r}
        assert {4, 5, 6} <= loss_steps
