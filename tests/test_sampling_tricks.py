"""Sampling tricks: truncation, DDLS Langevin refinement, style mixing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_engine import tiny_biggan_cfg, run_steps


class TestTruncation:
    def test_truncnorm_z_sampling(self):
        from studiogan_tpu.train.sample import sample_normal
        z = sample_normal(jax.random.PRNGKey(0), 4096, 32, truncation_factor=0.5)
        assert float(jnp.abs(z).max()) <= 0.5 + 1e-5
        z_full = sample_normal(jax.random.PRNGKey(0), 4096, 32, -1.0)
        assert float(jnp.abs(z_full).max()) > 2.0

    def test_generate_with_truncation(self):
        cfg = tiny_biggan_cfg()
        eng, state, _ = run_steps(cfg, 1)
        full, _ = eng.generate(state, jax.random.PRNGKey(1), 4,
                               truncation_factor=-1.0)
        trunc, _ = eng.generate(state, jax.random.PRNGKey(1), 4,
                                truncation_factor=0.5)
        assert not np.allclose(np.asarray(full), np.asarray(trunc))


class TestLangevin:
    def test_ddls_refinement_runs_and_changes_samples(self):
        """DDLS (reference sample.py:195-215): eval-time energy-based
        latent refinement using D's logits."""
        cfg = tiny_biggan_cfg()
        eng, state, _ = run_steps(cfg, 1)
        base, _ = eng.generate(state, jax.random.PRNGKey(2), 4)
        cfg.RUN.langevin_sampling = True
        cfg.RUN.langevin_rate = 0.01
        cfg.RUN.langevin_noise_std = 0.1
        cfg.RUN.langevin_decay = 0.9
        cfg.RUN.langevin_decay_steps = 5
        cfg.RUN.langevin_steps = 10
        refined, _ = eng.generate(state, jax.random.PRNGKey(2), 4)
        assert refined.shape == base.shape
        assert bool(jnp.isfinite(refined).all())
        assert not np.allclose(np.asarray(base), np.asarray(refined))


class TestEvaluatorRefIS:
    def test_ref_dataset_is(self, tmp_path):
        from studiogan_tpu.metrics import Evaluator
        cfg = tiny_biggan_cfg()
        cfg.RUN.save_dir = str(tmp_path)
        ev = Evaluator(cfg, eval_dataset_kwargs=dict(
            data_name="SYNTHETIC", data_dir=None, train=True,
            synthetic_size=32, num_classes=10, img_size=32),
            num_generate=32)
        score, std = ev.ref_dataset_is()
        assert np.isfinite(score) and score >= 1.0
