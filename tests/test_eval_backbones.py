"""Structural tests for the ported eval backbones (param counts match the
torch originals exactly; feature/logit contracts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def n_params(v):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))


class TestResNet50:
    def test_param_count_and_shapes(self):
        from studiogan_tpu.metrics.backbones import ResNet50
        m = ResNet50()
        v = jax.eval_shape(lambda k: m.init(k, jnp.zeros((1, 224, 224, 3))),
                           jax.random.PRNGKey(0))
        assert abs(n_params(v) - 25_557_032) < 1000  # torchvision resnet50

    def test_converter_roundtrip(self):
        from studiogan_tpu.metrics.backbones import (ResNet50,
                                                     convert_resnet50_torch)
        m = ResNet50()
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        # synthesize a torch-style state dict from the flax tree, convert
        # back, and check exact leaf coverage
        sd = {}

        def emit(prefix_t, dst_params, dst_stats):
            pass

        params = jax.device_get(v["params"])
        stats = jax.device_get(v["batch_stats"])
        def conv_w(p): return np.asarray(p).transpose(3, 2, 0, 1)
        sd["conv1.weight"] = conv_w(params["conv1"]["kernel"])
        for nm, fl in [("weight", "scale"), ("bias", "bias")]:
            sd[f"bn1.{nm}"] = np.asarray(params["bn1"][fl])
        sd["bn1.running_mean"] = np.asarray(stats["bn1"]["mean"])
        sd["bn1.running_var"] = np.asarray(stats["bn1"]["var"])
        for li, blocks in [(1, 3), (2, 4), (3, 6), (4, 3)]:
            for bi in range(blocks):
                key = f"layer{li}_{bi}"
                for ci in (1, 2, 3):
                    sd[f"layer{li}.{bi}.conv{ci}.weight"] = conv_w(
                        params[key][f"conv{ci}"]["kernel"])
                    bnp = params[key][f"bn{ci}"]
                    bns = stats[key][f"bn{ci}"]
                    sd[f"layer{li}.{bi}.bn{ci}.weight"] = np.asarray(bnp["scale"])
                    sd[f"layer{li}.{bi}.bn{ci}.bias"] = np.asarray(bnp["bias"])
                    sd[f"layer{li}.{bi}.bn{ci}.running_mean"] = np.asarray(bns["mean"])
                    sd[f"layer{li}.{bi}.bn{ci}.running_var"] = np.asarray(bns["var"])
                if "downsample_conv" in params[key]:
                    sd[f"layer{li}.{bi}.downsample.0.weight"] = conv_w(
                        params[key]["downsample_conv"]["kernel"])
                    bnp = params[key]["downsample_bn"]
                    bns = stats[key]["downsample_bn"]
                    sd[f"layer{li}.{bi}.downsample.1.weight"] = np.asarray(bnp["scale"])
                    sd[f"layer{li}.{bi}.downsample.1.bias"] = np.asarray(bnp["bias"])
                    sd[f"layer{li}.{bi}.downsample.1.running_mean"] = np.asarray(bns["mean"])
                    sd[f"layer{li}.{bi}.downsample.1.running_var"] = np.asarray(bns["var"])
        sd["fc.weight"] = np.asarray(params["fc"]["kernel"]).T
        sd["fc.bias"] = np.asarray(params["fc"]["bias"])

        converted = convert_resnet50_torch(sd)
        flat_a = {jax.tree_util.keystr(p): a for p, a in
                  jax.tree_util.tree_leaves_with_path(
                      {"params": params, "batch_stats": stats})}
        flat_b = {jax.tree_util.keystr(p): a for p, a in
                  jax.tree_util.tree_leaves_with_path(converted)}
        assert set(flat_a) == set(flat_b)
        for k in flat_a:
            np.testing.assert_allclose(flat_a[k], flat_b[k], err_msg=k)

        # converted weights actually run
        f, l = m.apply(converted, jnp.zeros((1, 64, 64, 3)))
        assert f.shape == (1, 2048) and l.shape == (1, 1000)


class TestSwin:
    def test_param_count(self):
        from studiogan_tpu.metrics.swin import SwinTransformer
        m = SwinTransformer()
        v = jax.eval_shape(lambda k: m.init(k, jnp.zeros((1, 224, 224, 3))),
                           jax.random.PRNGKey(0))
        assert abs(n_params(v) - 87_768_224) < 5000  # torch swin_base

    def test_shifted_window_forward(self):
        from studiogan_tpu.metrics.swin import SwinTransformer
        m = SwinTransformer(img_size=56, embed_dim=32, depths=(2, 2),
                            num_heads=(2, 4))
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))
        f, l = m.apply(v, jax.random.normal(jax.random.PRNGKey(1),
                                            (2, 56, 56, 3)))
        assert f.shape == (2, 64) and l.shape == (2, 1000)
        assert bool(jnp.isfinite(f).all())


class TestDINOViT:
    def test_full_feature_dim(self):
        from studiogan_tpu.metrics.backbones import DINOViTSmall
        m = DINOViTSmall()
        v = jax.eval_shape(lambda k: m.init(k, jnp.zeros((1, 224, 224, 3))),
                           jax.random.PRNGKey(0))
        out = jax.eval_shape(lambda: m.apply(
            jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), v),
            jnp.zeros((2, 224, 224, 3))))
        feats, logits = out
        assert feats.shape == (2, 1536)  # 4 last blocks x 384
        assert logits.shape == (2, 1000)
