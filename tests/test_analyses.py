"""Post-training analyses (reference worker.py:988-1668) driven end to
end on a tiny BigGAN + synthetic dataset: every method must produce its
artifact with the reference's format/shape contract."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _biggan_cfg
from studiogan_tpu.analysis import analyses
from studiogan_tpu.data import Dataset_
from studiogan_tpu.models import build_discriminator, build_generator
from studiogan_tpu.train import TrainEngine


class _StubEvalModel:
    """get_outputs contract of LoadEvalModel (preparation.py:183-196):
    deterministic cheap features so the analyses' math is exercised
    without a pretrained backbone."""

    def get_outputs(self, x, quantize=False):
        x = np.asarray(x, np.float32)
        if quantize:  # [-1,1] float -> uint8 domain
            x = (x + 1.0) * 127.5
        n = x.shape[0]
        # 6-dim features (top/bottom half-means per channel): fewer dims
        # than the per-class sample counts, so class covariances stay
        # full-rank and sqrtm in FID is well-posed
        h = x.shape[1] // 2
        feats = np.concatenate([x[:, :h].mean(axis=(1, 2)),
                                x[:, h:].mean(axis=(1, 2))], axis=1)
        logits = np.tile(feats, (1, 2))[:, :10]
        return feats, logits


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    cfg = _biggan_cfg(g_conv_dim=8, d_conv_dim=8, batch_size=8,
                      d_updates=1, acml=1)
    G, D = build_generator(cfg), build_discriminator(cfg)
    eng = TrainEngine(cfg, G, D)
    state = eng.init_state(jax.random.PRNGKey(0))
    ds = Dataset_("SYNTHETIC", None, train=True, synthetic_size=96,
                  num_classes=10, img_size=32)
    save_dir = str(tmp_path_factory.mktemp("analyses"))
    return eng, state, ds, save_dir


class TestAnalyses:
    def test_knn(self, tiny_run):
        eng, state, ds, save_dir = tiny_run
        path = analyses.run_k_nearest_neighbor(
            eng, state, _StubEvalModel(), ds, save_dir, "run", num_rows=3,
            num_cols=4)
        assert os.path.exists(path) and path.endswith("knn_analysis.png")

    def test_interpolation_both_modes(self, tiny_run):
        eng, state, ds, save_dir = tiny_run
        p1 = analyses.run_linear_interpolation(eng, state, save_dir, "run",
                                               num_rows=2, num_cols=4,
                                               fix_y=True)
        p2 = analyses.run_linear_interpolation(eng, state, save_dir, "run",
                                               num_rows=2, num_cols=4,
                                               fix_z=True)
        assert p1.endswith("fix_y.png") and os.path.exists(p1)
        assert p2.endswith("fix_z.png") and os.path.exists(p2)

    def test_frequency(self, tiny_run):
        eng, state, ds, save_dir = tiny_run
        path = analyses.run_frequency_analysis(eng, state, ds, save_dir,
                                               "run", num_images=16)
        d = np.load(path)
        assert d["real_spectrum"].shape == (32, 32)
        assert d["fake_spectrum"].shape == (32, 32)
        assert np.isfinite(d["real_spectrum"]).all()

    def test_tsne(self, tiny_run):
        eng, state, ds, save_dir = tiny_run
        path = analyses.run_tsne(eng, state, ds, save_dir, "run",
                                 num_samples=48)
        d = np.load(path)
        assert d["embedding"].shape == (96, 2)  # 48 real + 48 fake
        assert d["is_real"].sum() == 48

    def test_intra_class_fid(self, tiny_run):
        eng, state, ds, save_dir = tiny_run
        ifids = analyses.calculate_intra_class_fid(
            eng, state, _StubEvalModel(), ds, save_dir, num_per_class=8)
        assert set(ifids) == set(range(10))
        assert all(np.isfinite(v) and v >= 0 for v in ifids.values())

    def test_sefa(self, tiny_run):
        eng, state, ds, save_dir = tiny_run
        paths = analyses.run_semantic_factorization(
            eng, state, save_dir, "run", num_semantic_axis=2, num_cols=4,
            num_images=2)
        assert len(paths) == 2
        assert all(os.path.exists(p) for p in paths)
