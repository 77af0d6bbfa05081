"""Folder-vs-folder evaluator CLI (reference src/evaluate.py semantics)."""

import numpy as np
import pytest


@pytest.mark.slow
class TestEvaluateCLI:
    def _write_folder(self, root, n=24, seed=0):
        from PIL import Image
        rng = np.random.RandomState(seed)
        root.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(img).save(root / f"{i}.png")

    def test_identical_folders_fid_zero(self, tmp_path):
        from studiogan_tpu.evaluate import evaluate
        self._write_folder(tmp_path / "a", seed=0)
        scores = evaluate(str(tmp_path / "a"), str(tmp_path / "a"),
                          ["fid", "is", "prdc"], batch_size=8)
        assert abs(scores["fid"]) < 1e-3
        assert scores["precision"] == 1.0 and scores["recall"] == 1.0
        assert scores["is"] >= 1.0

    def test_different_folders_fid_positive(self, tmp_path):
        from studiogan_tpu.evaluate import evaluate
        self._write_folder(tmp_path / "a", seed=0)
        self._write_folder(tmp_path / "b", seed=1)
        scores = evaluate(str(tmp_path / "a"), str(tmp_path / "b"), ["fid"],
                          batch_size=8)
        assert scores["fid"] > 0

    def test_moments_npz_input(self, tmp_path):
        from studiogan_tpu.evaluate import evaluate
        from studiogan_tpu.metrics import fid as fid_mod
        self._write_folder(tmp_path / "b", seed=2)
        rng = np.random.RandomState(0)
        feats = rng.randn(64, 2048)
        mu, sigma = fid_mod.compute_moments(feats)
        np.savez(tmp_path / "stats_moments.npz", mu=mu, sigma=sigma)
        scores = evaluate(str(tmp_path / "stats_moments.npz"),
                          str(tmp_path / "b"), ["fid"], batch_size=8)
        assert np.isfinite(scores["fid"])
