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

def resnet50_torch_sd(v):
    """Synthesize a torchvision-named state dict from a ResNet50 flax tree."""
    sd = {}
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
    return sd


class TestResNet50Roundtrip:
    def test_converter_roundtrip(self):
        from studiogan_tpu.metrics.backbones import (ResNet50,
                                                     convert_resnet50_torch)
        m = ResNet50()
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        sd = resnet50_torch_sd(v)
        params = jax.device_get(v["params"])
        stats = jax.device_get(v["batch_stats"])
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


def _t(a):
    import torch
    return torch.as_tensor(np.asarray(a), dtype=torch.float64)


class TestDINOConverter:
    """Forward parity of DINOViTSmall + convert_dino_vits against a
    functional torch implementation of the reference DINO ViT
    (reference vit.py:121-240, misc.py:632-691) on a random state dict."""

    DIM, DEPTH, HEADS, PATCH, IMG, NLAST, NCLS = 64, 6, 4, 8, 32, 4, 10

    def _random_sd(self, rng):
        import torch
        g = torch.Generator().manual_seed(rng)
        d = self.DIM

        def r(*shape):
            return torch.randn(*shape, generator=g, dtype=torch.float64) * 0.2

        sd = {"cls_token": r(1, 1, d),
              "pos_embed": r(1, (self.IMG // self.PATCH) ** 2 + 1, d),
              "patch_embed.proj.weight": r(d, 3, self.PATCH, self.PATCH),
              "patch_embed.proj.bias": r(d),
              "norm.weight": 1 + 0.1 * r(d), "norm.bias": r(d)}
        for i in range(self.DEPTH):
            p = f"blocks.{i}."
            sd[p + "norm1.weight"] = 1 + 0.1 * r(d)
            sd[p + "norm1.bias"] = r(d)
            sd[p + "attn.qkv.weight"] = r(3 * d, d)
            sd[p + "attn.qkv.bias"] = r(3 * d)
            sd[p + "attn.proj.weight"] = r(d, d)
            sd[p + "attn.proj.bias"] = r(d)
            sd[p + "norm2.weight"] = 1 + 0.1 * r(d)
            sd[p + "norm2.bias"] = r(d)
            sd[p + "mlp.fc1.weight"] = r(4 * d, d)
            sd[p + "mlp.fc1.bias"] = r(4 * d)
            sd[p + "mlp.fc2.weight"] = r(d, 4 * d)
            sd[p + "mlp.fc2.bias"] = r(d)
        lin = {"module.linear.weight": r(self.NCLS, self.NLAST * d),
               "module.linear.bias": r(self.NCLS)}
        return sd, lin

    def _torch_forward(self, sd, lin, x_nchw):
        import torch
        import torch.nn.functional as F
        d, heads = self.DIM, self.HEADS
        hd = d // heads
        x = F.conv2d(x_nchw, sd["patch_embed.proj.weight"],
                     sd["patch_embed.proj.bias"], stride=self.PATCH)
        B, C, Hp, Wp = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = torch.cat([sd["cls_token"].expand(B, -1, -1), x], dim=1)
        x = x + sd["pos_embed"]

        def ln(h, p):
            return F.layer_norm(h, (d,), sd[p + ".weight"], sd[p + ".bias"],
                                1e-6)

        outs = []
        for i in range(self.DEPTH):
            p = f"blocks.{i}"
            h = ln(x, p + ".norm1")
            B, N, _ = h.shape
            qkv = F.linear(h, sd[p + ".attn.qkv.weight"],
                           sd[p + ".attn.qkv.bias"])
            qkv = qkv.reshape(B, N, 3, heads, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
            attn = attn.softmax(-1)
            h = (attn @ v).transpose(1, 2).reshape(B, N, d)
            x = x + F.linear(h, sd[p + ".attn.proj.weight"],
                             sd[p + ".attn.proj.bias"])
            h = ln(x, p + ".norm2")
            h = F.gelu(F.linear(h, sd[p + ".mlp.fc1.weight"],
                                sd[p + ".mlp.fc1.bias"]))
            h = F.linear(h, sd[p + ".mlp.fc2.weight"],
                         sd[p + ".mlp.fc2.bias"])
            x = x + h
            if self.DEPTH - i <= self.NLAST:
                outs.append(ln(x, "norm")[:, 0])
        feats = torch.cat(outs, dim=-1)
        logits = F.linear(feats, lin["module.linear.weight"],
                          lin["module.linear.bias"])
        return feats, logits

    def test_forward_parity(self):
        import torch
        from studiogan_tpu.metrics.backbones import (DINOViTSmall,
                                                     convert_dino_vits)
        sd, lin = self._random_sd(0)
        x = torch.randn(2, 3, self.IMG, self.IMG,
                        generator=torch.Generator().manual_seed(7),
                        dtype=torch.float64) * 0.5
        tf, tl = self._torch_forward(sd, lin, x)

        model = DINOViTSmall(patch_size=self.PATCH, dim=self.DIM,
                             depth=self.DEPTH, num_heads=self.HEADS,
                             num_last_blocks=self.NLAST,
                             num_classes=self.NCLS)
        variables = convert_dino_vits(
            {k: v.numpy() for k, v in sd.items()},
            {k: v.numpy() for k, v in lin.items()},
            dim=self.DIM, num_heads=self.HEADS)
        xf = jnp.asarray(x.numpy().transpose(0, 2, 3, 1), jnp.float32)
        ff, fl = model.apply(jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float32), variables), xf)
        np.testing.assert_allclose(np.asarray(ff), tf.numpy(), rtol=2e-3,
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(fl), tl.numpy(), rtol=2e-3,
                                   atol=2e-3)


class TestSwinConverter:
    """Forward parity of SwinTransformer + convert_swin_torch against a
    functional torch implementation of the Microsoft Swin used by the
    reference (reference swin_transformer.py) on a random state dict."""

    IMG, PATCH, EMBED, WS = 56, 4, 16, 7
    DEPTHS, HEADS, NCLS = (2, 2), (2, 4), 10

    def _random_sd(self, seed):
        import torch
        g = torch.Generator().manual_seed(seed)

        def r(*shape):
            return torch.randn(*shape, generator=g, dtype=torch.float64) * 0.2

        e, ws = self.EMBED, self.WS
        sd = {"patch_embed.proj.weight": r(e, 3, self.PATCH, self.PATCH),
              "patch_embed.proj.bias": r(e),
              "patch_embed.norm.weight": 1 + 0.1 * r(e),
              "patch_embed.norm.bias": r(e)}
        for li, depth in enumerate(self.DEPTHS):
            dim = e * 2 ** li
            for bi in range(depth):
                p = f"layers.{li}.blocks.{bi}"
                sd[p + ".norm1.weight"] = 1 + 0.1 * r(dim)
                sd[p + ".norm1.bias"] = r(dim)
                sd[p + ".attn.relative_position_bias_table"] = r(
                    (2 * ws - 1) ** 2, self.HEADS[li])
                sd[p + ".attn.qkv.weight"] = r(3 * dim, dim)
                sd[p + ".attn.qkv.bias"] = r(3 * dim)
                sd[p + ".attn.proj.weight"] = r(dim, dim)
                sd[p + ".attn.proj.bias"] = r(dim)
                sd[p + ".norm2.weight"] = 1 + 0.1 * r(dim)
                sd[p + ".norm2.bias"] = r(dim)
                sd[p + ".mlp.fc1.weight"] = r(4 * dim, dim)
                sd[p + ".mlp.fc1.bias"] = r(4 * dim)
                sd[p + ".mlp.fc2.weight"] = r(dim, 4 * dim)
                sd[p + ".mlp.fc2.bias"] = r(dim)
            if li < len(self.DEPTHS) - 1:
                sd[f"layers.{li}.downsample.norm.weight"] = 1 + 0.1 * r(4 * dim)
                sd[f"layers.{li}.downsample.norm.bias"] = r(4 * dim)
                sd[f"layers.{li}.downsample.reduction.weight"] = r(2 * dim,
                                                                   4 * dim)
        final = e * 2 ** (len(self.DEPTHS) - 1)
        sd["norm.weight"] = 1 + 0.1 * r(final)
        sd["norm.bias"] = r(final)
        sd["head.weight"] = r(self.NCLS, final)
        sd["head.bias"] = r(self.NCLS)
        return sd

    @staticmethod
    def _rel_idx(ws):
        import torch
        coords = torch.stack(torch.meshgrid(torch.arange(ws),
                                            torch.arange(ws), indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        return rel.sum(-1)

    def _torch_forward(self, sd, x_nchw):
        import torch
        import torch.nn.functional as F

        def ln(h, p, dim):
            return F.layer_norm(h, (dim,), sd[p + ".weight"],
                                sd[p + ".bias"], 1e-5)

        x = F.conv2d(x_nchw, sd["patch_embed.proj.weight"],
                     sd["patch_embed.proj.bias"], stride=self.PATCH)
        B, C, H, W = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = ln(x, "patch_embed.norm", C)
        res = H
        for li, depth in enumerate(self.DEPTHS):
            dim = self.EMBED * 2 ** li
            heads = self.HEADS[li]
            h_res = res // 2 ** li
            ws = min(self.WS, h_res)
            for bi in range(depth):
                p = f"layers.{li}.blocks.{bi}"
                shift = (self.WS // 2 if bi % 2 == 1 else 0)
                if ws >= h_res:
                    shift = 0
                shortcut = x
                h = ln(x, p + ".norm1", dim).view(B, h_res, h_res, dim)
                if shift > 0:
                    h = torch.roll(h, (-shift, -shift), dims=(1, 2))
                # window partition
                nw = h_res // ws
                h = h.view(B, nw, ws, nw, ws, dim).permute(
                    0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, dim)
                bw, n, _ = h.shape
                hd = dim // heads
                qkv = F.linear(h, sd[p + ".attn.qkv.weight"],
                               sd[p + ".attn.qkv.bias"])
                qkv = qkv.reshape(bw, n, 3, heads, hd).permute(2, 0, 3, 1, 4)
                q, k, v = qkv[0], qkv[1], qkv[2]
                attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
                idx = self._rel_idx(ws).view(-1)
                bias = sd[p + ".attn.relative_position_bias_table"][idx]
                bias = bias.view(n, n, heads).permute(2, 0, 1)
                attn = attn + bias.unsqueeze(0)
                if shift > 0:
                    img_mask = torch.zeros(1, h_res, h_res, 1,
                                           dtype=torch.float64)
                    cnt = 0
                    for hs in (slice(0, -ws), slice(-ws, -shift),
                               slice(-shift, None)):
                        for wss in (slice(0, -ws), slice(-ws, -shift),
                                    slice(-shift, None)):
                            img_mask[:, hs, wss, :] = cnt
                            cnt += 1
                    mw = img_mask.view(1, nw, ws, nw, ws, 1).permute(
                        0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
                    am = mw.unsqueeze(1) - mw.unsqueeze(2)
                    am = am.masked_fill(am != 0, -100.0).masked_fill(
                        am == 0, 0.0)
                    attn = attn.view(bw // am.shape[0], am.shape[0], heads,
                                     n, n) + am.unsqueeze(1).unsqueeze(0)
                    attn = attn.view(bw, heads, n, n)
                attn = attn.softmax(-1)
                h = (attn @ v).transpose(1, 2).reshape(bw, n, dim)
                h = F.linear(h, sd[p + ".attn.proj.weight"],
                             sd[p + ".attn.proj.bias"])
                # window reverse
                h = h.view(B, nw, nw, ws, ws, dim).permute(
                    0, 1, 3, 2, 4, 5).reshape(B, h_res, h_res, dim)
                if shift > 0:
                    h = torch.roll(h, (shift, shift), dims=(1, 2))
                x = shortcut + h.reshape(B, h_res * h_res, dim)
                h = ln(x, p + ".norm2", dim)
                h = F.gelu(F.linear(h, sd[p + ".mlp.fc1.weight"],
                                    sd[p + ".mlp.fc1.bias"]))
                x = x + F.linear(h, sd[p + ".mlp.fc2.weight"],
                                 sd[p + ".mlp.fc2.bias"])
            if li < len(self.DEPTHS) - 1:
                xs = x.view(B, h_res, h_res, dim)
                x = torch.cat([xs[:, 0::2, 0::2], xs[:, 1::2, 0::2],
                               xs[:, 0::2, 1::2], xs[:, 1::2, 1::2]], -1)
                x = x.view(B, (h_res // 2) ** 2, 4 * dim)
                x = ln(x, f"layers.{li}.downsample.norm", 4 * dim)
                x = F.linear(x, sd[f"layers.{li}.downsample.reduction.weight"])
        final = self.EMBED * 2 ** (len(self.DEPTHS) - 1)
        x = ln(x, "norm", final)
        feats = x.mean(dim=1)
        logits = F.linear(feats, sd["head.weight"], sd["head.bias"])
        return feats, logits

    def test_forward_parity(self):
        import torch
        from studiogan_tpu.metrics.swin import (SwinTransformer,
                                                convert_swin_torch)
        sd = self._random_sd(0)
        x = torch.randn(2, 3, self.IMG, self.IMG,
                        generator=torch.Generator().manual_seed(9),
                        dtype=torch.float64) * 0.5
        tf, tl = self._torch_forward(sd, x)

        model = SwinTransformer(img_size=self.IMG, patch_size=self.PATCH,
                                num_classes=self.NCLS, embed_dim=self.EMBED,
                                depths=self.DEPTHS, num_heads=self.HEADS,
                                window_size=self.WS)
        variables = convert_swin_torch({k: v.numpy() for k, v in sd.items()},
                                       depths=self.DEPTHS)
        xf = jnp.asarray(x.numpy().transpose(0, 2, 3, 1), jnp.float32)
        ff, fl = model.apply(jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float32), variables), xf)
        np.testing.assert_allclose(np.asarray(ff), tf.numpy(), rtol=2e-3,
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(fl), tl.numpy(), rtol=2e-3,
                                   atol=2e-3)


class TestSwAVAndTorchInception:
    def test_swav_tar_conversion(self):
        """SwAV trunk under module.* with projection_head/prototypes dropped;
        fc grafted from the separate linear checkpoint
        (reference preparation.py:54-65)."""
        from studiogan_tpu.metrics.backbones import (ResNet50,
                                                     convert_swav_resnet50)
        m = ResNet50()
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        sd = resnet50_torch_sd(v)
        fc_w, fc_b = sd.pop("fc.weight"), sd.pop("fc.bias")
        trunk = {"module." + k: v for k, v in sd.items()}
        trunk["module.projection_head.0.weight"] = np.zeros((4, 4), np.float32)
        trunk["module.prototypes.weight"] = np.zeros((4, 4), np.float32)
        lin = {"module.linear.weight": fc_w, "module.linear.bias": fc_b}
        converted = convert_swav_resnet50(trunk, lin)
        flat_a = {jax.tree_util.keystr(p): a for p, a in
                  jax.tree_util.tree_leaves_with_path(jax.device_get(v))}
        flat_b = {jax.tree_util.keystr(p): a for p, a in
                  jax.tree_util.tree_leaves_with_path(converted)}
        assert set(flat_a) == set(flat_b)
        for k in flat_a:
            np.testing.assert_allclose(flat_a[k], flat_b[k], err_msg=k)

    def test_torchvision_inception_variant(self):
        """The torchvision variant differs from the FID port exactly in the
        documented ways: count-pad avg pools, avg Mixed_7c, 1000-way fc,
        transform_input (reference inception_net.py:135-218 vs torchvision)."""
        from studiogan_tpu.metrics.inception_v3 import InceptionV3
        tv = InceptionV3(num_classes=1000, variant="torchvision",
                         transform_input=True)
        fid = InceptionV3()
        vs_tv = jax.eval_shape(lambda k: tv.init(k, jnp.zeros((1, 75, 75, 3))),
                               jax.random.PRNGKey(0))
        vs_fid = jax.eval_shape(lambda k: fid.init(k, jnp.zeros((1, 75, 75, 3))),
                                jax.random.PRNGKey(0))
        n_tv = sum(int(np.prod(p.shape)) for p in
                   jax.tree.leaves(vs_tv["params"]))
        n_fid = sum(int(np.prod(p.shape)) for p in
                    jax.tree.leaves(vs_fid["params"]))
        # param sets are identical except the fc head (1008 vs 1000)
        assert n_fid - n_tv == 8 * (2048 + 1)

    def test_converter_drops_auxlogits(self):
        from studiogan_tpu.metrics.inception_v3 import load_torch_state_dict
        out = load_torch_state_dict(
            {"AuxLogits.conv0.conv.weight": np.zeros((1, 1, 1, 1)),
             "fc.weight": np.zeros((10, 2048)), "fc.bias": np.zeros((10,))})
        assert "AuxLogits" not in out["params"]
        assert out["params"]["fc"]["kernel"].shape == (2048, 10)

    def test_transform_input_matches_torch_formula(self):
        import torch
        from studiogan_tpu.metrics.inception_v3 import InceptionV3
        x = np.random.RandomState(0).uniform(-2, 2, (1, 8, 8, 3)).astype(
            np.float32)
        # torchvision _transform_input
        xt = torch.as_tensor(x.transpose(0, 3, 1, 2))
        ch = [xt[:, 0] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5,
              xt[:, 1] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5,
              xt[:, 2] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5]
        expected = torch.stack(ch, 1).numpy().transpose(0, 2, 3, 1)

        got = np.stack([x[..., 0] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5,
                        x[..., 1] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5,
                        x[..., 2] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5],
                       axis=-1)
        np.testing.assert_allclose(got, expected, rtol=1e-6)
