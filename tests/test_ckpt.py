"""Checkpoint unit tests (reference utils/ckpt.py + worker.save):
sync/async save, atomic write, pruning, metadata, exact restore."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from studiogan_tpu.train import ckpt as ckpt_util


def _tiny_state():
    from __graft_entry__ import _biggan_cfg
    from studiogan_tpu.models import build_discriminator, build_generator
    from studiogan_tpu.train import TrainEngine

    cfg = _biggan_cfg(g_conv_dim=8, d_conv_dim=8, batch_size=4,
                      d_updates=1, acml=1)
    G, D = build_generator(cfg), build_discriminator(cfg)
    eng = TrainEngine(cfg, G, D)
    return eng.init_state(jax.random.PRNGKey(3))


class TestCkpt:
    def test_sync_roundtrip_and_prune(self, tmp_path):
        state = _tiny_state()
        d = str(tmp_path)
        p1 = ckpt_util.save_ckpt(d, state, dict(seed=1), when="current")
        assert os.path.isdir(p1) and os.path.exists(p1 + ".meta.json")
        state2 = state.replace(step=state.step + 5)
        p2 = ckpt_util.save_ckpt(d, state2, dict(seed=1), when="current")
        assert not os.path.exists(p1), "older 'current' snapshot not pruned"
        found = ckpt_util.find_ckpt(d)
        assert found == p2
        restored, meta = ckpt_util.load_ckpt(found, state)
        assert int(restored.step) == int(state2.step)
        assert meta["seed"] == 1
        a = jax.tree.leaves(state2.g_params)[0]
        b = jax.tree.leaves(restored.g_params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_async_save_is_equivalent_and_atomic(self, tmp_path):
        state = _tiny_state()
        d = str(tmp_path)
        path = ckpt_util.save_ckpt(d, state, dict(tag="async"),
                                   when="current", async_save=True)
        ckpt_util.wait_for_pending_saves()
        assert os.path.isdir(path) and not os.path.exists(path + ".tmp")
        restored, meta = ckpt_util.load_ckpt(path, state)
        assert meta["tag"] == "async"
        for x, y in zip(jax.tree.leaves(jax.device_get(state)),
                        jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_async_snapshot_decouples_from_later_mutation(self, tmp_path):
        """The on-device snapshot must capture the state at call time even
        if the caller's arrays are donated/updated afterwards."""
        state = _tiny_state()
        d = str(tmp_path)
        step_at_save = int(state.step)
        ckpt_util.save_ckpt(d, state, None, when="best", async_save=True)
        # mutate the python-side reference immediately
        state = state.replace(step=state.step + 100)
        ckpt_util.wait_for_pending_saves()
        found = ckpt_util.find_ckpt(d, load_best=True)
        restored, _ = ckpt_util.load_ckpt(found, state)
        assert int(restored.step) == step_at_save

    def test_resume_survives_stale_tmp_dirs(self, tmp_path):
        """A crash mid-save leaves '…step=N.tmp' / orbax staging dirs
        behind; find_ckpt must sweep them and resume from the last good
        snapshot instead of raising (ADVICE r2: int() on the .tmp
        suffix broke resume)."""
        state = _tiny_state()
        d = str(tmp_path)
        good = ckpt_util.save_ckpt(d, state, None, when="current")
        os.makedirs(os.path.join(d, "model=current-weights-step=99.tmp"))
        os.makedirs(os.path.join(
            d, "model=current-weights-step=99.orbax-checkpoint-tmp-123"))
        found = ckpt_util.find_ckpt(d)
        assert found == good
        assert not os.path.exists(
            os.path.join(d, "model=current-weights-step=99.tmp"))

    def test_async_write_errors_propagate(self, tmp_path, monkeypatch):
        """A failed background write (disk full, serialization error)
        must surface at wait_for_pending_saves, not vanish with the
        daemon thread."""
        import pytest

        state = _tiny_state()

        def boom(*a, **k):
            raise OSError("no space left on device")

        monkeypatch.setattr(ckpt_util, "_write", boom)
        ckpt_util.save_ckpt(str(tmp_path), state, None, when="current",
                            async_save=True)
        with pytest.raises(RuntimeError, match="async checkpoint"):
            ckpt_util.wait_for_pending_saves()
        # error queue drained: a second wait is clean
        ckpt_util.wait_for_pending_saves()
