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


class TestLatentOptimise:
    def test_transport_cost_matches_numpy(self):
        """latent_optimise parity vs a numpy emulation of reference
        losses.py:278-298 (lo_rate=1 makes the drop mask all-ones a.s.;
        trsp_cost accumulates mean ||delta_z||^2 per executed step)."""
        from studiogan_tpu.losses.losses import latent_optimise

        def fn(z, y):  # adv(z) = per-sample sum(z^2) -> grad 2z
            return jnp.sum(z ** 2, axis=1)

        z0 = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (4, 6)),
                        np.float64)
        lo_alpha, lo_beta, steps = 0.9, 0.1, 4
        zs, cost = latent_optimise(
            jnp.asarray(z0, jnp.float32), jnp.zeros((4,), jnp.int32), fn,
            jax.random.PRNGKey(1), 1.0, steps, lo_alpha, lo_beta)

        z, expect = z0.copy(), 0.0
        for _ in range(steps - 1):
            g = 2 * z
            gn = (g ** 2).sum(1, keepdims=True)
            dz = lo_alpha * g / (lo_beta + gn)
            expect += (dz ** 2).sum(1).mean()
            z = np.clip(z + dz, -1.0, 1.0)
        np.testing.assert_allclose(float(cost), expect, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(zs), z, rtol=1e-4, atol=1e-5)

    def test_logan_trsp_cost_changes_losses(self):
        """A LOGAN config trains with a nonzero lo_lambda * trsp_cost term:
        losses differ from the trsp-disabled (lo_lambda=0) run with
        otherwise identical RNG (reference worker.py:323,628)."""
        base = {"LOSS.apply_lo": True, "LOSS.lo_alpha": 0.9,
                "LOSS.lo_beta": 0.1, "LOSS.lo_rate": 1.0,
                "LOSS.lo_steps4train": 3, "LOSS.lo_steps4eval": 3,
                "MODEL.apply_attn": False}
        cfg_on = tiny_biggan_cfg(**base, **{"LOSS.lo_lambda": 50.0})
        cfg_off = tiny_biggan_cfg(**base, **{"LOSS.lo_lambda": 0.0})
        _, _, m_on = run_steps(cfg_on, 1)
        _, _, m_off = run_steps(cfg_off, 1)
        assert np.isfinite(float(m_on["d_loss"]))
        assert abs(float(m_on["d_loss"]) - float(m_off["d_loss"])) > 1e-7
        assert abs(float(m_on["g_loss"]) - float(m_off["g_loss"])) > 1e-7


class TestStandingStatistics:
    """reference misc.apply_standing_statistics (misc.py:301-333): reset BN
    running stats, then accumulate momentum-0.1 EMAs over random-size
    generator forward passes."""

    def test_standing_state_momentum_ema(self):
        cfg = tiny_biggan_cfg(**{"RUN.standing_statistics": True,
                                 "RUN.standing_max_batch": 8,
                                 "RUN.standing_step": 3})
        eng, state, _ = run_steps(cfg, 1)
        k = jax.random.PRNGKey(5)
        standing = eng.prepare_standing_state(state, k)
        base = jax.device_get(state.ema_or_g_state)

        flat_s = {jax.tree_util.keystr(p): np.asarray(x) for p, x in
                  jax.tree_util.tree_leaves_with_path(standing["batch_stats"])}
        flat_b = {jax.tree_util.keystr(p): np.asarray(x) for p, x in
                  jax.tree_util.tree_leaves_with_path(base["batch_stats"])}
        assert set(flat_s) == set(flat_b)
        moved = False
        for key in flat_s:
            assert np.isfinite(flat_s[key]).all(), key
            if "var" in key:
                assert (flat_s[key] > 0).all(), key
            if "mean" in key or "var" in key:
                moved |= bool(np.abs(flat_s[key] - flat_b[key]).max() > 1e-6)
        assert moved, "standing stats identical to training running stats"

        # deterministic in rng; different rng -> different batch-size draws
        again = eng.prepare_standing_state(state, k)
        other = eng.prepare_standing_state(state, jax.random.PRNGKey(6))
        s0 = jax.tree.leaves(standing["batch_stats"])
        np.testing.assert_allclose(np.asarray(s0[0]),
                                   np.asarray(jax.tree.leaves(again["batch_stats"])[0]))
        diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
                 for a, b in zip(s0, jax.tree.leaves(other["batch_stats"]))]
        assert max(diffs) > 0

    def test_single_step_ema_discount(self):
        """standing_step=1: running = 0.9*reset + 0.1*batch, so the var
        leaves must sit near 0.9 (reset var 1 dominates)."""
        cfg = tiny_biggan_cfg(**{"RUN.standing_statistics": True,
                                 "RUN.standing_max_batch": 8,
                                 "RUN.standing_step": 1})
        eng, state, _ = run_steps(cfg, 1)
        standing = eng.prepare_standing_state(state, jax.random.PRNGKey(0))
        for p, x in jax.tree_util.tree_leaves_with_path(
                standing["batch_stats"]):
            if str(getattr(p[-1], "key", "")) == "var":
                # 0.9*1 floor from the reset var; batch var adds >= 0
                v = np.asarray(x)
                assert (v > 0.85).all(), \
                    (jax.tree_util.keystr(p), v.min(), v.max())
