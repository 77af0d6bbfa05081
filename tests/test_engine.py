"""End-to-end engine tests: the minimum slice (SURVEY.md §7 step 2) and the
SPMD path on a virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from studiogan_tpu.config import Configurations
from studiogan_tpu.models import build_generator, build_discriminator
from studiogan_tpu.train import TrainEngine


def tiny_biggan_cfg(**over):
    cfg = Configurations()
    cfg.DATA.name, cfg.DATA.img_size, cfg.DATA.num_classes = "CIFAR10", 32, 10
    cfg.MODEL.backbone = "big_resnet"
    cfg.MODEL.g_cond_mtd, cfg.MODEL.d_cond_mtd = "cBN", "PD"
    cfg.MODEL.apply_g_sn = cfg.MODEL.apply_d_sn = True
    cfg.MODEL.apply_attn = True
    cfg.MODEL.attn_g_loc, cfg.MODEL.attn_d_loc = [2], [1]
    cfg.MODEL.z_dim, cfg.MODEL.g_shared_dim = 80, 32
    cfg.MODEL.g_conv_dim = cfg.MODEL.d_conv_dim = 8
    cfg.MODEL.apply_g_ema = True
    cfg.MODEL.g_ema_decay, cfg.MODEL.g_ema_start = 0.999, 0
    cfg.LOSS.adv_loss = "hinge"
    cfg.OPTIMIZATION.batch_size = 8
    cfg.OPTIMIZATION.d_updates_per_step = 2
    cfg.OPTIMIZATION.acml_steps = 1
    for k, v in over.items():
        ns, key = k.split(".")
        setattr(getattr(cfg, ns), key, v)
    cfg.finalize()
    return cfg


def make_basket(cfg, seed=0):
    O = cfg.OPTIMIZATION
    n = O.d_updates_per_step * O.acml_steps
    rng = np.random.RandomState(seed)
    imgs = jnp.asarray(rng.uniform(-1, 1, (n, O.batch_size, cfg.DATA.img_size,
                                           cfg.DATA.img_size, 3)), jnp.float32)
    labels = jnp.asarray(rng.randint(0, cfg.DATA.num_classes,
                                     (n, O.batch_size)), jnp.int32)
    return imgs, labels


def run_steps(cfg, n_steps=2):
    G, D = build_generator(cfg), build_discriminator(cfg)
    eng = TrainEngine(cfg, G, D)
    state = eng.init_state(jax.random.PRNGKey(0))
    step = jax.jit(eng.train_step, donate_argnums=0)
    metrics = None
    for i in range(n_steps):
        imgs, labels = make_basket(cfg, seed=i)
        state, metrics = step(state, imgs, labels)
    return eng, state, metrics


class TestBigGANSlice:
    def test_two_steps_finite_and_params_move(self):
        cfg = tiny_biggan_cfg()
        G, D = build_generator(cfg), build_discriminator(cfg)
        eng = TrainEngine(cfg, G, D)
        state0 = eng.init_state(jax.random.PRNGKey(0))
        g0 = jax.tree.map(jnp.copy, state0.g_params)
        step = jax.jit(eng.train_step)
        imgs, labels = make_basket(cfg)
        state1, m1 = step(state0, imgs, labels)
        state2, m2 = step(state1, imgs, labels)
        assert np.isfinite(float(m2["d_loss"])) and np.isfinite(float(m2["g_loss"]))
        assert int(state2.step) == 2
        moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()) > 0,
                             g0, state2.g_params)
        assert any(jax.tree.leaves(moved))
        # EMA params differ from raw params after updates (decay > 0)
        diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                            state2.g_params, state2.g_ema_params)
        assert max(jax.tree.leaves(diff)) > 0

    def test_generate_eval(self):
        cfg = tiny_biggan_cfg()
        eng, state, _ = run_steps(cfg, 1)
        imgs, labels = eng.generate(state, jax.random.PRNGKey(7), 4)
        assert imgs.shape == (4, 32, 32, 3)
        assert float(jnp.abs(imgs).max()) <= 1.0


class TestLossVariants:
    @pytest.mark.parametrize("over", [
        dict(),  # hinge + PD (BigGAN)
        {"MODEL.d_cond_mtd": "AC", "LOSS.cond_lambda": 1.0},
        {"MODEL.d_cond_mtd": "2C", "MODEL.d_embed_dim": 16,
         "LOSS.temperature": 0.5, "LOSS.cond_lambda": 1.0},
        {"MODEL.d_cond_mtd": "D2DCE", "MODEL.d_embed_dim": 16,
         "LOSS.temperature": 0.5, "LOSS.m_p": 0.98, "LOSS.cond_lambda": 1.0,
         "MODEL.normalize_d_embed": True},
        {"LOSS.adv_loss": "wasserstein", "LOSS.apply_gp": True,
         "LOSS.gp_lambda": 10.0},
        {"LOSS.apply_r1_reg": True, "LOSS.r1_lambda": 0.5,
         "LOSS.adv_loss": "vanilla"},
        {"LOSS.apply_lecam": True, "LOSS.lecam_lambda": 0.1,
         "LOSS.lecam_ema_start_iter": 0, "LOSS.lecam_ema_decay": 0.9},
        {"LOSS.apply_topk": True, "LOSS.topk_gamma": 0.99, "LOSS.topk_nu": 0.5},
    ])
    def test_variant_one_step(self, over):
        cfg = tiny_biggan_cfg(**over)
        _, state, metrics = run_steps(cfg, 1)
        assert np.isfinite(float(metrics["d_loss"]))
        assert np.isfinite(float(metrics["g_loss"]))


class TestSPMD:
    def test_data_parallel_8_devices(self):
        """The one SPMD step replaces DP/DDP/MDDP: batch sharded over an
        8-device mesh, state replicated (SURVEY.md §2.8)."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        cfg = tiny_biggan_cfg()
        G, D = build_generator(cfg), build_discriminator(cfg)
        eng = TrainEngine(cfg, G, D)
        state = eng.init_state(jax.random.PRNGKey(0))

        mesh = Mesh(np.array(jax.devices()), ("data",))
        repl = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P(None, "data"))
        state = jax.device_put(state, repl)
        imgs, labels = make_basket(cfg)
        imgs = jax.device_put(imgs, batch_sh)
        labels = jax.device_put(labels, batch_sh)

        step = jax.jit(eng.train_step,
                       in_shardings=(repl, batch_sh, batch_sh),
                       out_shardings=(repl, repl))
        state, metrics = step(state, imgs, labels)
        assert np.isfinite(float(metrics["d_loss"]))
        assert int(state.step) == 1


class TestFreezeD:
    def test_reference_blocklist_numbering_with_attention(self):
        """The reference's flat blocklist gives SelfAttention its own index
        (misc.py:192-216 + big_resnet.py:307-344): freezeD=2 on a D with
        attention after block0 freezes block0 AND attn0, not block0+block1."""
        from studiogan_tpu.train.optim import freezeD_frozen_modules
        names = {"block0", "attn0", "block1", "block2", "adv_dense", "embed"}
        assert freezeD_frozen_modules(names, 1, "big_resnet") == {"block0"}
        assert freezeD_frozen_modules(names, 2, "big_resnet") == {
            "block0", "attn0"}
        assert freezeD_frozen_modules(names, 3, "big_resnet") == {
            "block0", "attn0", "block1"}

    def test_deep_variant_numbering(self):
        """big_resnet_deep gives each depth sub-block its own entry
        (reference big_resnet_deep_legacy.py:273-285)."""
        from studiogan_tpu.train.optim import freezeD_frozen_modules
        names = {"block0_0", "block0_1", "attn0", "block1_0", "block1_1"}
        got = freezeD_frozen_modules(names, 3, "big_resnet_deep_legacy")
        assert got == {"block0_0", "block0_1", "attn0"}

    def test_frozen_blocks_do_not_move(self):
        cfg = tiny_biggan_cfg(**{"RUN.freezeD": 2})
        G, D = build_generator(cfg), build_discriminator(cfg)
        from studiogan_tpu.train import TrainEngine
        eng = TrainEngine(cfg, G, D)
        state0 = eng.init_state(jax.random.PRNGKey(0))
        d0 = jax.tree.map(jnp.copy, state0.d_params)
        step = jax.jit(eng.train_step)
        imgs, labels = make_basket(cfg)
        state1, _ = step(state0, imgs, labels)
        # attn is at d_loc [1] -> attn0 follows block0; freezeD=2 freezes both
        for frozen_key in ("block0", "attn0"):
            diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                                 d0[frozen_key], state1.d_params[frozen_key])
            assert max(jax.tree.leaves(diffs)) == 0.0, frozen_key
        moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                             d0["block1"], state1.d_params["block1"])
        assert max(jax.tree.leaves(moved)) > 0.0


class TestADAController:
    """p-controller semantics (reference worker.py:479-487): adjusted per
    D update on qualifying steps, from the sign heuristic accumulated
    since the last adjustment."""

    def _ada_cfg(self, **over):
        return tiny_biggan_cfg(**{
            "AUG.apply_ada": True, "AUG.ada_aug_type": "bgc",
            "AUG.ada_initial_augment_p": 0.0, "AUG.ada_target": 0.6,
            "AUG.ada_kimg": 1, "AUG.ada_interval": 1, **over})

    def test_aa_adjust_unit(self):
        cfg = self._ada_cfg(**{"AUG.ada_interval": 4})
        G, D = build_generator(cfg), build_discriminator(cfg)
        eng = TrainEngine(cfg, G, D)
        st = eng.init_state(jax.random.PRNGKey(0))

        # qualifying step (0 % 4 == 0), heuristic 1.0 > target 0.6:
        # p += count / (kimg*1000), stats reset
        st_q = st.replace(ada_stats=jnp.asarray([8.0, 8.0]),
                          ada_p=jnp.asarray(0.5))
        out = eng._aa_adjust(st_q)
        np.testing.assert_allclose(float(out.ada_p), 0.5 + 8 / 1000.0)
        np.testing.assert_allclose(np.asarray(out.ada_stats), [0.0, 0.0])

        # heuristic below target: p decreases (clipped at 0)
        st_dn = st.replace(ada_stats=jnp.asarray([-8.0, 8.0]),
                           ada_p=jnp.asarray(0.002))
        out = eng._aa_adjust(st_dn)
        np.testing.assert_allclose(float(out.ada_p), 0.0)

        # non-qualifying step: untouched, stats keep accumulating
        st_nq = st.replace(step=jnp.asarray(3, jnp.int32),
                           ada_stats=jnp.asarray([5.0, 8.0]),
                           ada_p=jnp.asarray(0.5))
        out = eng._aa_adjust(st_nq)
        np.testing.assert_allclose(float(out.ada_p), 0.5)
        np.testing.assert_allclose(np.asarray(out.ada_stats), [5.0, 8.0])

    def test_per_update_granularity_in_step(self):
        """With aa_interval=1 and d_updates=2, each D update adjusts with
        its own batch's stats (count=B per adjustment), so the accumulator
        is empty after the step and p moved by a multiple of B/(kimg*1000),
        at most d_updates steps of it."""
        cfg = self._ada_cfg()
        _, state, metrics = run_steps(cfg, 1)
        np.testing.assert_allclose(np.asarray(state.ada_stats), [0.0, 0.0])
        unit = cfg.OPTIMIZATION.batch_size / 1000.0
        k = float(state.ada_p) / unit
        assert abs(k - round(k)) < 1e-4, (float(state.ada_p), unit)
        assert abs(round(k)) <= cfg.OPTIMIZATION.d_updates_per_step


class TestTensorParallel:
    def test_dp_tp_mesh_matches_dp_only(self):
        """2D (data x model) mesh: big weights sharded over 'model', batch
        over 'data'.  One train step must match the DP-only result (GSPMD
        inserts the TP collectives; math is identical)."""
        from studiogan_tpu.parallel.mesh import setup_runtime

        cfg = tiny_biggan_cfg(**{"MODEL.g_conv_dim": 16,
                                 "MODEL.d_conv_dim": 16})
        imgs, labels = make_basket(cfg)

        def one_step(model_axis):
            rt = setup_runtime(model_axis=model_axis)
            rt.tp_min_size = 1024  # tiny model: shard anything substantial
            G, D = build_generator(cfg), build_discriminator(cfg)
            eng = TrainEngine(cfg, G, D)
            state = eng.init_state(jax.random.PRNGKey(0))
            sh = rt.state_sharding(state)
            if model_axis > 1:  # something really is model-sharded
                assert any("model" in tuple(s.spec) for s in
                           jax.tree.leaves(sh) if hasattr(s, "spec"))
            state = jax.device_put(state, sh)
            step = jax.jit(eng.train_step,
                           in_shardings=(sh, rt.basket, rt.basket),
                           out_shardings=(sh, rt.replicated))
            state, metrics = step(state,
                                  jax.device_put(imgs, rt.basket),
                                  jax.device_put(labels, rt.basket))
            fp = sum(float(jnp.abs(p).sum())
                     for p in jax.tree.leaves(state.g_params))
            return float(metrics["d_loss"]), float(metrics["g_loss"]), fp

        d2, g2, fp2 = one_step(2)
        d1, g1, fp1 = one_step(1)
        np.testing.assert_allclose(d2, d1, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(fp2, fp1, rtol=1e-5)


class TestZeroSharding:
    def test_fsdp_matches_dp_only(self):
        """ZeRO/FSDP-style sharding of optimizer moments + EMA copies over
        'data' (Runtime.fsdp): pure memory-layout change — one train step
        and a generate from the (sharded) EMA weights must match the
        replicated DP run; GSPMD inserts the reduce-scatters/all-gathers."""
        from studiogan_tpu.parallel.mesh import setup_runtime

        cfg = tiny_biggan_cfg(**{"MODEL.g_conv_dim": 16,
                                 "MODEL.d_conv_dim": 16})
        imgs, labels = make_basket(cfg)

        def one_step(fsdp):
            rt = setup_runtime(fsdp=fsdp)
            rt.fsdp_min_size = 1024  # tiny model: shard anything substantial
            G, D = build_generator(cfg), build_discriminator(cfg)
            eng = TrainEngine(cfg, G, D)
            state = eng.init_state(jax.random.PRNGKey(0))
            sh = rt.state_sharding(state)
            if fsdp:
                def data_sharded(tree):
                    return any("data" in tuple(s.spec) for s in
                               jax.tree.leaves(tree) if hasattr(s, "spec"))
                # moments + EMA really are ZeRO-sharded ...
                assert data_sharded(sh.d_opt) and data_sharded(sh.g_opt)
                assert data_sharded(sh.g_ema_params)
                # ... while the live params stay replicated (read every fwd)
                assert not data_sharded(sh.g_params)
                assert not data_sharded(sh.d_params)
            state = jax.device_put(state, sh)
            step = jax.jit(eng.train_step,
                           in_shardings=(sh, rt.basket, rt.basket),
                           out_shardings=(sh, rt.replicated))
            state, metrics = step(state,
                                  jax.device_put(imgs, rt.basket),
                                  jax.device_put(labels, rt.basket))
            ema_fp = sum(float(jnp.abs(p).sum())
                         for p in jax.tree.leaves(state.g_ema_params))
            fake, _ = eng.generate(state, jax.random.PRNGKey(5), 8)
            return (float(metrics["d_loss"]), float(metrics["g_loss"]),
                    ema_fp, np.asarray(fake))

        dz, gz, ez, fz = one_step(True)
        d1, g1, e1, f1 = one_step(False)
        np.testing.assert_allclose(dz, d1, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gz, g1, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(ez, e1, rtol=1e-5)
        np.testing.assert_allclose(fz, f1, rtol=1e-4, atol=1e-5)


def test_unrolled_scans_match_looped():
    """unroll_scans=True is a scheduling/accounting knob only — the
    trained state must be bit-identical to the looped scans."""
    from __graft_entry__ import _biggan_cfg
    from studiogan_tpu.models import build_discriminator, build_generator
    from studiogan_tpu.train import TrainEngine

    cfg = _biggan_cfg(g_conv_dim=8, d_conv_dim=8, batch_size=4,
                      d_updates=2, acml=2)
    G, D = build_generator(cfg), build_discriminator(cfg)
    rng = np.random.RandomState(0)
    n_micro = 4
    imgs = jnp.asarray(rng.uniform(-1, 1, (n_micro, 4, 32, 32, 3)), jnp.float32)
    labs = jnp.asarray(rng.randint(0, 10, (n_micro, 4)), jnp.int32)

    outs = []
    for unroll in (False, True):
        eng = TrainEngine(cfg, G, D, unroll_scans=unroll)
        st = eng.init_state(jax.random.PRNGKey(7))
        st, m = jax.jit(eng.train_step)(st, imgs, labs)
        outs.append((jax.device_get(st.g_params), jax.device_get(st.d_params),
                     float(m["d_loss"]), float(m["g_loss"])))
    # unrolling lets XLA reassociate float adds inside fused reductions;
    # after two Adam updates (grad/sqrt(v) of near-zero grads) that shows
    # up as ~1e-4-level absolute differences on O(1) params
    (g0, d0, dl0, gl0), (g1, d1, dl1, gl1) = outs
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=5e-4),
                 g0, g1)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=5e-4),
                 d0, d1)
    np.testing.assert_allclose(dl0, dl1, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(gl0, gl1, rtol=1e-3, atol=1e-4)


def test_remat_matches_plain():
    """RUN.remat only trades compute for memory (jax.checkpoint around the
    per-micro losses); the resulting state must match the plain step."""
    from __graft_entry__ import _biggan_cfg
    from studiogan_tpu.models import build_discriminator, build_generator
    from studiogan_tpu.train import TrainEngine

    cfg = _biggan_cfg(g_conv_dim=8, d_conv_dim=8, batch_size=4,
                      d_updates=1, acml=2)
    G, D = build_generator(cfg), build_discriminator(cfg)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.uniform(-1, 1, (2, 4, 32, 32, 3)), jnp.float32)
    labs = jnp.asarray(rng.randint(0, 10, (2, 4)), jnp.int32)

    outs = []
    for remat in (False, True):
        cfg.RUN.remat = remat
        eng = TrainEngine(cfg, G, D)
        st = eng.init_state(jax.random.PRNGKey(7))
        st, m = jax.jit(eng.train_step)(st, imgs, labs)
        outs.append((jax.device_get(st.g_params), jax.device_get(st.d_params),
                     float(m["d_loss"])))
    (g0, d0, dl0), (g1, d1, dl1) = outs
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=5e-4),
                 g0, g1)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=5e-4),
                 d0, d1)
    np.testing.assert_allclose(dl0, dl1, rtol=1e-4, atol=1e-5)


def test_train_steps_returns_per_step_metric_stack():
    """Chunked dispatch must not discard loss-curve granularity: the
    metric stack from train_steps carries one row per step and each row
    equals the corresponding sequential train_step call (reference
    worker.py:686 accumulates per-step)."""
    cfg = tiny_biggan_cfg()
    G, D = build_generator(cfg), build_discriminator(cfg)
    eng = TrainEngine(cfg, G, D)
    n_chunk = 3

    # sequential per-step loop
    state = eng.init_state(jax.random.PRNGKey(0))
    step = jax.jit(eng.train_step)
    seq = []
    baskets = [make_basket(cfg, seed=i) for i in range(n_chunk)]
    for imgs, labels in baskets:
        state, m = step(state, imgs, labels)
        seq.append(jax.device_get(m))

    # one chunked dispatch over the same baskets
    state2 = eng.init_state(jax.random.PRNGKey(0))
    gi = jnp.stack([b[0] for b in baskets])
    gl = jnp.stack([b[1] for b in baskets])
    state2, stacked = jax.jit(eng.train_steps)(state2, gi, gl)
    stacked = jax.device_get(stacked)

    for k in seq[0]:
        assert np.asarray(stacked[k]).shape[0] == n_chunk, k
        for j in range(n_chunk):
            np.testing.assert_allclose(
                np.asarray(stacked[k])[j], np.asarray(seq[j][k]),
                rtol=2e-4, atol=2e-5, err_msg=f"{k}[{j}]")
