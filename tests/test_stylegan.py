"""StyleGAN2 backbone + engine integration: lazy R1/PL, w_avg EMA,
truncation, style mixing, minibatch-std."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from studiogan_tpu.config import Configurations
from studiogan_tpu.models import stylegan2
from studiogan_tpu.train import TrainEngine


def sg2_cfg():
    cfg = Configurations()
    cfg.DATA.name, cfg.DATA.img_size, cfg.DATA.num_classes = "CIFAR10", 32, 10
    cfg.MODEL.backbone = "stylegan2"
    cfg.MODEL.g_cond_mtd, cfg.MODEL.d_cond_mtd = "cAdaIN", "SPD"
    cfg.MODEL.g_act_fn = cfg.MODEL.d_act_fn = "Auto"
    cfg.MODEL.z_dim = cfg.MODEL.w_dim = 32
    cfg.MODEL.apply_g_ema = True
    cfg.LOSS.adv_loss = "logistic"
    cfg.LOSS.apply_r1_reg = True
    cfg.LOSS.r1_lambda = 0.01
    cfg.LOSS.r1_place = "outside_loop"
    cfg.OPTIMIZATION.batch_size = 8
    cfg.OPTIMIZATION.g_lr = cfg.OPTIMIZATION.d_lr = 0.0025
    cfg.OPTIMIZATION.beta1, cfg.OPTIMIZATION.beta2 = 0.0, 0.99
    cfg.OPTIMIZATION.d_first = False
    cfg.OPTIMIZATION.d_updates_per_step = 1
    cfg.OPTIMIZATION.g_updates_per_step = 1
    cfg.STYLEGAN.g_reg_interval = 4
    cfg.STYLEGAN.d_reg_interval = 2
    cfg.STYLEGAN.mapping_network = 2
    cfg.STYLEGAN.style_mixing_p = 0.5
    cfg.STYLEGAN.g_ema_kimg = 500
    cfg.STYLEGAN.g_ema_rampup = 0.05
    cfg.STYLEGAN.apply_pl_reg = True
    cfg.STYLEGAN.pl_weight = 2.0
    cfg.STYLEGAN.d_architecture = "orig"
    cfg.STYLEGAN.d_epilogue_mbstd_group_size = 4
    cfg.RUN.train = True  # the compat contract requires -t or -ckpt
    cfg.finalize()
    cfg.check_compatability()
    return cfg


def small_modules(cfg):
    G = stylegan2.Generator(
        z_dim=cfg.MODEL.z_dim, c_dim=cfg.DATA.num_classes,
        w_dim=cfg.MODEL.w_dim, img_resolution=32, img_channels=3,
        num_classes=10, mapping_layers=2, channel_base=256, channel_max=32)
    D = stylegan2.Discriminator(
        c_dim=cfg.DATA.num_classes, img_resolution=32, img_channels=3,
        architecture="orig", channel_base=256, channel_max=32,
        d_cond_mtd="SPD", num_classes=10, mbstd_group_size=4)
    return G, D


class TestStyleGAN2Engine:
    def test_train_steps_with_lazy_regs(self):
        cfg = sg2_cfg()
        G, D = small_modules(cfg)
        eng = TrainEngine(cfg, G, D)
        state = eng.init_state(jax.random.PRNGKey(0))
        assert "stats_ema" in state.g_state
        step = jax.jit(eng.train_step)
        rng = np.random.RandomState(0)
        imgs = jnp.asarray(rng.uniform(-1, 1, (1, 8, 32, 32, 3)), jnp.float32)
        labels = jnp.asarray(rng.randint(0, 10, (1, 8)), jnp.int32)
        s1, m1 = step(state, imgs, labels)        # step 0: both lazy regs fire
        s2, m2 = step(s1, imgs, labels)           # step 1: neither fires
        assert np.isfinite(float(m2["d_loss"])) and np.isfinite(float(m2["g_loss"]))
        # pl_mean moved at step 0 (PL fired), unchanged at step 1
        assert float(s1.pl_mean) != 0.0
        assert float(s2.pl_mean) == float(s1.pl_mean)
        # w_avg EMA advanced during D-step generation
        w_avg = s2.g_state["stats_ema"]["mapping"]["w_avg"]
        assert float(jnp.abs(w_avg).max()) > 0

    def test_truncation_and_generate(self):
        cfg = sg2_cfg()
        G, D = small_modules(cfg)
        eng = TrainEngine(cfg, G, D)
        state = eng.init_state(jax.random.PRNGKey(0))
        imgs_full, _ = eng.generate(state, jax.random.PRNGKey(1), 4,
                                    truncation_factor=-1.0)
        imgs_trunc, _ = eng.generate(state, jax.random.PRNGKey(1), 4,
                                     truncation_factor=0.5)
        assert imgs_full.shape == (4, 32, 32, 3)
        # w_avg is ~0 at init, so truncation contracts outputs toward G(w~0)
        assert not np.allclose(np.asarray(imgs_full), np.asarray(imgs_trunc))


class TestStyleGAN2SPMD:
    def test_mesh_train_step(self):
        """StyleGAN engine (lazy R1/PL, w_avg EMA, SPD projection) under a
        batch-sharded 8-device mesh."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        cfg = sg2_cfg()
        G, D = small_modules(cfg)
        eng = TrainEngine(cfg, G, D)
        state = eng.init_state(jax.random.PRNGKey(0))
        mesh = Mesh(np.array(jax.devices()), ("data",))
        repl = NamedSharding(mesh, P())
        basket = NamedSharding(mesh, P(None, "data"))
        state = jax.device_put(state, repl)
        rng = np.random.RandomState(0)
        imgs = jax.device_put(
            jnp.asarray(rng.uniform(-1, 1, (1, 8, 32, 32, 3)), jnp.float32),
            basket)
        labels = jax.device_put(
            jnp.asarray(rng.randint(0, 10, (1, 8)), jnp.int32), basket)
        step = jax.jit(eng.train_step, in_shardings=(repl, basket, basket),
                       out_shardings=(repl, repl))
        state, m = step(state, imgs, labels)
        assert int(state.step) == 1
        assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))


class TestStyleGANPieces:
    def test_mbstd_shapes(self):
        m = stylegan2.MinibatchStdLayer(group_size=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 16))
        y = m.apply({}, x)
        assert y.shape == (8, 4, 4, 17)
        # torch reshape(G,-1,...) makes stat groups strided: sample j pools
        # with {j%(n/g), j%(n/g)+(n/g), ...}; appended channel is constant
        # within a strided group (samples 0 and 2 here), distinct across
        std_map = np.asarray(y[..., -1])
        assert np.allclose(std_map[0], std_map[2])
        assert not np.allclose(std_map[0], std_map[1])

    def test_mbstd_value_parity_with_torch_formula(self):
        """Value-level check against the reference's exact computation
        (reference stylegan2.py:659-680: reshape(G,-1,F,c,H,W), stats over
        dim 0, y.repeat(G,1,H,W) tiling)."""
        n, h, w, c, g, f = 8, 3, 3, 6, 4, 2
        x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (n, h, w, c)),
                       np.float64)
        # numpy emulation of the torch NCHW code
        xt = x.transpose(0, 3, 1, 2)                        # NCHW
        yt = xt.reshape(g, n // g, f, c // f, h, w)
        yt = yt - yt.mean(axis=0, keepdims=True)
        yt = np.sqrt((yt ** 2).mean(axis=0) + 1e-8)
        yt = yt.mean(axis=(2, 3, 4)).reshape(-1, f, 1, 1)   # (n/g, F, 1, 1)
        yt = np.tile(yt, (g, 1, h, w))                      # y.repeat(G,1,H,W)
        expected = np.concatenate([xt, yt], axis=1).transpose(0, 2, 3, 1)

        m = stylegan2.MinibatchStdLayer(group_size=g, num_channels=f)
        got = np.asarray(m.apply({}, jnp.asarray(x, jnp.float32)))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_modulated_conv_demodulation_normalizes(self):
        """After demodulation each output channel has ~unit scale."""
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (4, 8, 8, 16))
        w = jax.random.normal(jax.random.PRNGKey(1), (32, 16, 3, 3))
        styles = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (4, 16))) + 0.5
        y = stylegan2.modulated_conv2d(x, w, styles, padding=1)
        assert y.shape == (4, 8, 8, 32)
        assert 0.5 < float(y.std()) < 2.0  # demodulated scale ~1

    def test_bf16_grad_through_resample_convs(self):
        """Regression: conv's transpose rule under preferred_element_type=
        f32 with bf16 operands builds a mixed-dtype conv and raises
        (hit by -mpc + ADA smoke configs, r5).  Grad w.r.t. a bf16 input
        must flow through conv2d_resample and the depthwise FIR path."""
        from studiogan_tpu.ops.upfirdn2d import setup_filter, upsample2d
        f = setup_filter(np.asarray([1, 3, 3, 1], np.float32))
        w = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 3, 3))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4),
                              jnp.bfloat16)

        def loss(xi):
            y = stylegan2.conv2d_resample(xi, w, f, up=2, padding=1)
            y = upsample2d(y, f, up=2)  # exercises _depthwise / band path
            return jnp.sum(y.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(x)
        assert g.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(g, np.float32)).all()

    def test_fully_connected_lr_multiplier(self):
        fc = stylegan2.FullyConnectedLayer(8, lr_multiplier=0.01)
        v = fc.init(jax.random.PRNGKey(0), jnp.ones((2, 4)))
        # raw param is scaled UP by 1/lr_mult at init; runtime gain undoes it
        assert float(jnp.abs(v["params"]["weight"]).mean()) > 10.0
        y = fc.apply(v, jnp.ones((2, 4)))
        assert float(jnp.abs(y).mean()) < 5.0


class TestFusedModconv:
    def test_fused_equals_input_scale_path(self):
        """The grouped-conv fused path (reference fused_modconv=True,
        stylegan2.py:84-94) must match the input-scale formulation on the
        full synthesis stack (up=2 layers, demod, ToRGB without demod)."""
        cfg = sg2_cfg()
        G, _ = small_modules(cfg)
        z = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.MODEL.z_dim))
        y = jnp.arange(4) % 10
        rngs = {"params": jax.random.PRNGKey(0),
                "noise": jax.random.PRNGKey(2),
                "style_mix": jax.random.PRNGKey(3)}
        vs = G.init(rngs, z, y, train=False)
        ref = G.apply(vs, z, y, train=False)
        fused = G.apply(vs, z, y, train=False, fused_modconv=True)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        assert not np.allclose(np.asarray(ref), 0.0)

    def test_fused_modconv_unit(self):
        from studiogan_tpu.models.stylegan2 import (modulated_conv2d,
                                                    setup_filter)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(3, 8, 8, 6), jnp.float32)
        w = jnp.asarray(rng.randn(5, 6, 3, 3) * 0.3, jnp.float32)
        s = jnp.asarray(rng.rand(3, 6) + 0.5, jnp.float32)
        noise = jnp.asarray(rng.randn(3, 16, 16, 1) * 0.1, jnp.float32)
        f = setup_filter(np.asarray([1, 3, 3, 1], np.float32))
        for up, nz in ((1, None), (2, noise)):
            a = modulated_conv2d(x, w, s, noise=None if up == 1 else nz,
                                 up=up, padding=1, resample_filter=f)
            b = modulated_conv2d(x, w, s, noise=None if up == 1 else nz,
                                 up=up, padding=1, resample_filter=f,
                                 fused=True)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestStyleGAN3Engine:
    def _cfg(self):
        cfg = sg2_cfg()
        cfg.MODEL.backbone = "stylegan3"
        cfg.STYLEGAN.stylegan3_cfg = "stylegan3-r"
        cfg.STYLEGAN.blur_init_sigma = 2.0
        cfg.STYLEGAN.apply_pl_reg = False   # sg3-r recipe: R1 only
        cfg.STYLEGAN.pl_weight = 0
        cfg.finalize()
        return cfg

    def test_train_step_blur_and_magnitude_ema(self):
        """Full jitted sg3-r train step: losses finite, the filtered_lrelu
        magnitude EMAs advance (stats_ema collection), the blur schedule
        starts at blur_init_sigma and fades (reference worker.py:264-272),
        and lazy R1 (outside loop) executes on gating steps."""
        from studiogan_tpu.models import stylegan3
        from studiogan_tpu.train import TrainEngine

        cfg = self._cfg()
        G = stylegan3.Generator(
            z_dim=cfg.MODEL.z_dim, c_dim=cfg.DATA.num_classes,
            w_dim=cfg.MODEL.w_dim, img_resolution=32, img_channels=3,
            num_classes=10, mapping_layers=2, channel_base=512,
            channel_max=32, conv_kernel=1, use_radial_filters=True,
            magnitude_ema_beta=0.9)
        _, D = small_modules(cfg)
        eng = TrainEngine(cfg, G, D)
        assert eng._blur_active
        s0 = float(eng._blur_schedule(jnp.asarray(0)))
        s_late = float(eng._blur_schedule(jnp.asarray(10 ** 6)))
        assert abs(s0 - 2.0) < 1e-6 and s_late == 0.0

        state = eng.init_state(jax.random.PRNGKey(0))
        ema0 = jax.device_get(
            [x for x in jax.tree.leaves(state.g_state["stats_ema"])])
        rng = np.random.RandomState(0)
        imgs = jnp.asarray(rng.uniform(-1, 1, (1, 8, 32, 32, 3)), jnp.float32)
        labs = jnp.asarray(rng.randint(0, 10, (1, 8)), jnp.int32)
        step = jax.jit(eng.train_step)
        for _ in range(2):
            state, m = step(state, imgs, labs)
        assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))
        ema1 = jax.device_get(
            [x for x in jax.tree.leaves(state.g_state["stats_ema"])])
        deltas = [float(np.abs(a - b).max()) for a, b in zip(ema0, ema1)]
        assert max(deltas) > 0, "magnitude/w_avg EMAs did not advance"
        assert int(state.step) == 2
