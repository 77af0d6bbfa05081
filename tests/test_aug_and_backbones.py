"""Augmentation modules + remaining backbones (BigGAN-Deep, StyleGAN3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def rng():
    return jax.random.PRNGKey(0)


class TestDiffAug:
    def test_policy_shapes_and_grad(self):
        from studiogan_tpu.aug.diffaug import apply_diffaug
        x = jax.random.normal(rng(), (4, 32, 32, 3)) * 0.5
        y = apply_diffaug(rng(), x)
        assert y.shape == x.shape
        g = jax.grad(lambda t: apply_diffaug(rng(), t).sum())(x)
        assert bool(jnp.isfinite(g).all())

    def test_cutout_zeroes_square(self):
        from studiogan_tpu.aug.diffaug import rand_cutout
        x = jnp.ones((2, 16, 16, 3))
        y = rand_cutout(rng(), x, ratio=0.5)
        # ~25% of pixels zeroed (8x8 of 16x16), up to border clipping
        frac = float((y == 0).mean())
        assert 0.05 < frac < 0.3


class TestCRAug:
    def test_flip_translation(self):
        from studiogan_tpu.aug.cr import apply_cr_aug
        x = jax.random.normal(rng(), (4, 32, 32, 3))
        y = apply_cr_aug(rng(), x)
        assert y.shape == x.shape
        assert not jnp.allclose(y, x)


class TestADA:
    def test_p_zero_identity(self):
        from studiogan_tpu.aug.ada_aug import AdaAugment
        aug = AdaAugment.from_preset("bgc")
        x = jax.random.normal(rng(), (2, 16, 16, 3)) * 0.5
        y = aug(jax.random.PRNGKey(1), x, 0.0)
        # p=0: all transforms collapse to identity; only the geometric
        # up/warp/down round-trip leaves tiny filter residue
        assert float(jnp.abs(y - x).max()) < 0.05

    def test_folded_geom_layout_matches_nhwc(self):
        # the geometric section runs channels-folded (N*C, H, W) on TPU
        # (NHWC C=3 canvases lane-pad 3->128 and OOM at 512px+); the
        # folded helpers must agree with the NHWC ones to float noise
        from studiogan_tpu.aug.ada_aug import (_grid_sample_bilinear,
                                               _grid_sample_bilinear_folded)
        from studiogan_tpu.ops.upfirdn2d import setup_filter, upsample2d
        r = np.random.RandomState(3)
        img = r.randn(2, 17, 13, 3).astype(np.float32)
        img3 = img.transpose(0, 3, 1, 2).reshape(6, 17, 13)
        f = np.asarray(setup_filter([1, 3, 3, 1]))
        y4 = upsample2d(jnp.asarray(img), f, up=2)
        y3 = upsample2d(jnp.asarray(img3), f, up=2)
        np.testing.assert_allclose(
            np.asarray(y3).reshape(2, 3, *y3.shape[1:]).transpose(0, 2, 3, 1),
            np.asarray(y4), atol=1e-5)
        grid = (r.rand(2, 5, 6, 2).astype(np.float32) * 2.4 - 1.2)
        a = _grid_sample_bilinear(jnp.asarray(img), jnp.asarray(grid))
        b = _grid_sample_bilinear_folded(
            jnp.asarray(img3), jnp.asarray(grid[..., 0]),
            jnp.asarray(grid[..., 1]), 3)
        np.testing.assert_allclose(
            np.asarray(b).reshape(2, 3, 5, 6).transpose(0, 2, 3, 1),
            np.asarray(a), atol=1e-6)

    def test_p_one_transforms_and_grads(self):
        from studiogan_tpu.aug.ada_aug import AdaAugment
        aug = AdaAugment.from_preset("bgcfnc")
        x = jax.random.normal(rng(), (2, 16, 16, 3)) * 0.5
        y = aug(jax.random.PRNGKey(1), x, 1.0)
        assert y.shape == x.shape and bool(jnp.isfinite(y).all())
        assert float(jnp.abs(y - x).mean()) > 0.01
        g = jax.grad(lambda t: aug(jax.random.PRNGKey(1), t, 1.0).sum())(x)
        assert bool(jnp.isfinite(g).all())


class TestSimclr:
    def test_hsv_roundtrip(self):
        from studiogan_tpu.aug.simclr_aug import hsv2rgb, rgb2hsv
        x = jax.random.uniform(rng(), (2, 8, 8, 3))
        np.testing.assert_allclose(np.asarray(hsv2rgb(rgb2hsv(x))),
                                   np.asarray(x), atol=1e-5)

    @pytest.mark.parametrize("t", ["simclr_basic", "simclr_hq_cutout", "byol"])
    def test_pipelines(self, t):
        from studiogan_tpu.aug.simclr_aug import SimclrAugment
        aug = SimclrAugment(t)
        x = jax.random.normal(rng(), (2, 32, 32, 3)) * 0.3
        y = aug(jax.random.PRNGKey(1), x)
        assert y.shape == x.shape and bool(jnp.isfinite(y).all())


class TestBigResnetDeep:
    @pytest.mark.parametrize("variant", ["legacy", "studiogan"])
    def test_forward_shapes(self, variant):
        from studiogan_tpu.models import big_resnet_deep as brd
        G = brd.Generator(variant=variant, z_dim=32, g_shared_dim=16,
                          img_size=32, g_conv_dim=8, g_depth=2,
                          apply_attn=False, attn_g_loc=(), g_cond_mtd="cBN",
                          num_classes=10)
        D = brd.Discriminator(variant=variant, img_size=32, d_conv_dim=8,
                              d_depth=2, apply_d_sn=True, apply_attn=False,
                              attn_d_loc=(), d_cond_mtd="PD", aux_cls_type="W/O",
                              d_embed_dim="N/A", normalize_d_embed=False,
                              num_classes=10)
        z = jax.random.normal(rng(), (2, 32))
        y = jnp.array([0, 1])
        gv = G.init(rng(), z, y)
        img, _ = G.apply(gv, z, y, mutable=["batch_stats", "sn"])
        assert img.shape == (2, 32, 32, 3)
        dv = D.init(rng(), img, y)
        out, _ = D.apply(dv, img, y, mutable=["batch_stats", "sn"])
        assert out["adv_output"].shape == (2,)


class TestStyleGAN3:
    def test_generator_t_and_r(self):
        from studiogan_tpu.models import stylegan3
        z = jax.random.normal(rng(), (2, 32))
        y = jnp.array([0, 1])
        for kw in (dict(conv_kernel=3, use_radial_filters=False),
                   dict(conv_kernel=1, use_radial_filters=True)):
            G = stylegan3.Generator(z_dim=32, c_dim=10, w_dim=32,
                                    img_resolution=32, img_channels=3,
                                    num_classes=10, mapping_layers=2,
                                    channel_base=1024, channel_max=64, **kw)
            v = G.init({"params": rng(), "style_mix": jax.random.PRNGKey(1)},
                       z, y)
            img, upd = G.apply(v, z, y, update_emas=True, mutable=["stats_ema"])
            assert img.shape == (2, 32, 32, 3)
            assert bool(jnp.isfinite(img).all())
            # magnitude EMAs advanced
            scalars = [float(x) for x in jax.tree.leaves(upd["stats_ema"])
                       if getattr(x, "ndim", 1) == 0]
            assert any(s != 1.0 for s in scalars)
