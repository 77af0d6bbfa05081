"""Reference-checkpoint converter: synthesize a torch-style state dict
with the reference's exact naming scheme from our own initialized model,
convert, and require exact tree + value equality."""

import jax
import jax.numpy as jnp
import numpy as np

from studiogan_tpu.config import Configurations
from studiogan_tpu.models import build_discriminator, build_generator
from studiogan_tpu.train.convert import convert_discriminator, convert_generator


def biggan_cfg():
    cfg = Configurations()
    cfg.DATA.name, cfg.DATA.img_size, cfg.DATA.num_classes = "CIFAR10", 32, 10
    cfg.MODEL.backbone = "big_resnet"
    cfg.MODEL.g_cond_mtd, cfg.MODEL.d_cond_mtd = "cBN", "PD"
    cfg.MODEL.apply_g_sn = cfg.MODEL.apply_d_sn = True
    cfg.MODEL.apply_attn = True
    cfg.MODEL.attn_g_loc, cfg.MODEL.attn_d_loc = [2], [1]
    cfg.MODEL.z_dim, cfg.MODEL.g_shared_dim = 80, 16
    cfg.MODEL.g_conv_dim = cfg.MODEL.d_conv_dim = 8
    cfg.finalize()
    return cfg


def _flatten(tree):
    return {jax.tree_util.keystr(p): np.asarray(a) for p, a in
            jax.tree_util.tree_leaves_with_path(tree)}


def _synth_torch_sd_from_g(variables, cfg):
    """Inverse of convert_generator: our tree -> torch names
    (reference big_resnet.py module structure with SN hooks)."""
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    sn = jax.device_get(variables["sn"])
    sd = {}

    def dense(dst_src, tree, sn_tree=None, bias=True):
        sd[dst_src + (".weight_orig" if sn_tree is not None else ".weight")] = \
            np.asarray(tree["kernel"]).T
        if sn_tree is not None:
            sd[dst_src + ".weight_u"] = np.asarray(sn_tree["u"])
            sd[dst_src + ".weight_v"] = np.asarray(sn_tree["v"])
        if bias and "bias" in tree:
            sd[dst_src + ".bias"] = np.asarray(tree["bias"])

    def conv(dst_src, tree, sn_tree=None, bias=True):
        sd[dst_src + (".weight_orig" if sn_tree is not None else ".weight")] = \
            np.asarray(tree["kernel"]).transpose(3, 2, 0, 1)
        if sn_tree is not None:
            sd[dst_src + ".weight_u"] = np.asarray(sn_tree["u"])
            sd[dst_src + ".weight_v"] = np.asarray(sn_tree["v"])
        if bias and "bias" in tree:
            sd[dst_src + ".bias"] = np.asarray(tree["bias"])

    def bn_stats(dst_src, tree, affine, p_tree=None):
        if affine:
            sd[dst_src + ".weight"] = np.asarray(p_tree["scale"])
            sd[dst_src + ".bias"] = np.asarray(p_tree["bias"])
        sd[dst_src + ".running_mean"] = np.asarray(tree["mean"])
        sd[dst_src + ".running_var"] = np.asarray(tree["var"])
        sd[dst_src + ".num_batches_tracked"] = np.asarray(tree["n"])

    # the reference views linear0's output as (N, C, 4, 4) while our
    # NHWC model reshapes to (N, 4, 4, C): the torch-side output axis is
    # the C-major permutation of ours (see convert._stem_perm)
    from studiogan_tpu.models.common import g_dims
    from studiogan_tpu.train.convert import _stem_perm
    in_dims, _ = g_dims(cfg.DATA.img_size, cfg.MODEL.g_conv_dim)
    p = _stem_perm(in_dims[0], 4)
    k = np.asarray(params["linear0"]["kernel"])
    wT = np.empty_like(k)
    wT[:, p] = k
    sd["linear0.weight_orig"] = wT.T
    u = np.asarray(sn["linear0"]["u"]).reshape(-1)
    ut = np.empty_like(u)
    ut[p] = u
    sd["linear0.weight_u"] = ut
    sd["linear0.weight_v"] = np.asarray(sn["linear0"]["v"]).reshape(-1)
    b = np.asarray(params["linear0"]["bias"])
    bt = np.empty_like(b)
    bt[p] = b
    sd["linear0.bias"] = bt
    sd["shared.weight"] = np.asarray(params["shared"]["embedding"])
    # layout: block0, block1, attn1, block2 (attn_g_loc=[2])
    layout = [("block", 0, 0), ("block", 1, 1), ("attn", 1, 2), ("block", 2, 3)]
    for kind, i, pos in layout:
        src = f"blocks.{pos}.0"
        if kind == "attn":
            a_p, a_s = params[f"attn{i}"], sn[f"attn{i}"]
            for t, o in (("conv1x1_theta", "theta"), ("conv1x1_phi", "phi"),
                         ("conv1x1_g", "g"), ("conv1x1_attn", "attn_out")):
                conv(f"{src}.{t}", a_p[o], a_s[o], bias=False)
            sd[f"{src}.sigma"] = np.asarray(a_p["sigma"])
            continue
        b_p, b_s = params[f"block{i}"], sn[f"block{i}"]
        b_bs = stats[f"block{i}"]
        for bn in ("bn1", "bn2"):
            dense(f"{src}.{bn}.gain", b_p[bn]["gain"], b_s[bn]["gain"], bias=False)
            dense(f"{src}.{bn}.bias", b_p[bn]["bias"], b_s[bn]["bias"], bias=False)
            bn_stats(f"{src}.{bn}.bn", b_bs[bn]["bn"], affine=False)
        for c_src, c_dst in (("conv2d0", "conv0"), ("conv2d1", "conv1"),
                             ("conv2d2", "conv2")):
            conv(f"{src}.{c_src}", b_p[c_dst], b_s[c_dst])
    bn_stats("bn4", stats["bn4"], affine=True, p_tree=params["bn4"])
    conv("conv2d5", params["conv5"], sn["conv5"])
    return sd


class TestConverterRoundtrip:
    def test_generator_exact(self):
        cfg = biggan_cfg()
        G = build_generator(cfg)
        z = jnp.zeros((2, 80))
        y = jnp.zeros((2,), jnp.int32)
        v = G.init(jax.random.PRNGKey(0), z, y)
        sd = _synth_torch_sd_from_g(v, cfg)
        converted, missing = convert_generator(sd, cfg)
        assert not missing, missing
        a = _flatten({"params": jax.device_get(v["params"]),
                      "batch_stats": jax.device_get(v["batch_stats"]),
                      "sn": jax.device_get(v["sn"])})
        b = _flatten(converted)
        assert set(a) == set(b), (set(a) - set(b), set(b) - set(a))
        for k in a:
            np.testing.assert_allclose(a[k], b[k], err_msg=k)
        # the converted tree actually runs
        img = G.apply(converted, z, y, train=False)
        assert img.shape == (2, 32, 32, 3)

    def test_discriminator_structure(self):
        """D conversion covers every parameter leaf (names derived from the
        reference's construction order)."""
        cfg = biggan_cfg()
        D = build_discriminator(cfg)
        x = jnp.zeros((2, 32, 32, 3))
        y = jnp.zeros((2,), jnp.int32)
        v = D.init(jax.random.PRNGKey(0), x, y)
        # synthesize torch names via the converter's own mapping run in
        # reverse: convert an empty sd and check which names it looked for
        from studiogan_tpu.train.convert import convert_discriminator
        _, missing = convert_discriminator({}, cfg)
        # every missing name is a weight the reference would provide
        assert any("linear1" in m for m in missing)
        assert any("blocks.0.0.conv2d1" in m for m in missing)
        assert any("blocks.1.0" in m for m in missing)  # attn after block 0? no: block1


# ---------------------------------------------------------------------------
# StyleGAN2 / StyleGAN3 checkpoint conversion
# ---------------------------------------------------------------------------

from studiogan_tpu.train.convert import (  # noqa: E402
    convert_stylegan3_generator, convert_stylegan_discriminator,
    convert_stylegan_generator)


def _sg_cfg(backbone="stylegan2", d_cond="SPD"):
    cfg = Configurations()
    cfg.DATA.name, cfg.DATA.img_size, cfg.DATA.num_classes = "CIFAR10", 32, 10
    cfg.MODEL.backbone = backbone
    cfg.MODEL.g_cond_mtd, cfg.MODEL.d_cond_mtd = "cAdaIN", d_cond
    cfg.MODEL.z_dim = cfg.MODEL.w_dim = 32
    cfg.STYLEGAN.mapping_network = 2
    if backbone == "stylegan3":
        cfg.STYLEGAN.stylegan3_cfg = "stylegan3-t"
    cfg.finalize()
    return cfg


def _sg_inverse_sd(variables, rename=None):
    """Our flax variables -> the reference's torch state-dict names.

    The flax modules keep torch parameter layouts on purpose, so the
    inverse is a pure path-join (plus the const CHW transpose and any
    layer renames the caller supplies)."""
    sd = {}
    for coll in ("params", "buffers", "stats_ema"):
        if coll not in variables:
            continue
        for path, leaf in jax.tree_util.tree_leaves_with_path(
                jax.device_get(variables[coll])):
            parts = [p.key for p in path]
            if rename is not None:
                parts = rename(parts)
            arr = np.asarray(leaf)
            if parts[-1] == "const":
                arr = arr.transpose(2, 0, 1)  # flax HWC -> torch CHW
            sd[".".join(parts)] = arr
    return sd


def _assert_tree_equal(expect_variables, got_variables):
    a = _flatten({k: jax.device_get(v) for k, v in expect_variables.items()})
    b = _flatten(got_variables)
    assert set(a) == set(b), (sorted(set(a) - set(b))[:8],
                              sorted(set(b) - set(a))[:8])
    for k in a:
        np.testing.assert_allclose(a[k], b[k], err_msg=k)


class TestStyleGANConverter:
    def test_sg2_generator_exact(self):
        from studiogan_tpu.models import stylegan2
        cfg = _sg_cfg()
        G = stylegan2.Generator(z_dim=32, c_dim=10, w_dim=32,
                                img_resolution=32, img_channels=3,
                                num_classes=10, mapping_layers=2,
                                channel_base=1024, channel_max=64)
        z = jnp.zeros((2, 32))
        y = jnp.zeros((2,), jnp.int32)
        v = G.init({"params": jax.random.PRNGKey(0),
                    "noise": jax.random.PRNGKey(1),
                    "style_mix": jax.random.PRNGKey(2)}, z, y)
        v = jax.device_get(v)
        sd = _sg_inverse_sd(v)
        converted, missing = convert_stylegan_generator(sd, cfg)
        assert not missing, missing
        _assert_tree_equal(v, converted)
        img = G.apply(converted, z, y, train=False)
        assert img.shape == (2, 32, 32, 3)

    def test_sg2_discriminator_exact(self):
        from studiogan_tpu.models import stylegan2
        cfg = _sg_cfg()
        D = stylegan2.Discriminator(c_dim=10, img_resolution=32,
                                    img_channels=3, channel_base=1024,
                                    channel_max=64, d_cond_mtd="SPD",
                                    num_classes=10, mbstd_group_size=2)
        img = jnp.zeros((2, 32, 32, 3))
        y = jnp.zeros((2,), jnp.int32)
        v = jax.device_get(D.init(jax.random.PRNGKey(0), img, y))
        sd = _sg_inverse_sd(v)
        converted, missing = convert_stylegan_discriminator(sd, cfg)
        assert not missing, missing
        _assert_tree_equal(v, converted)
        out = D.apply(converted, img, y, train=False)
        assert out["adv_output"].shape == (2,)

    def test_sg3_generator_exact(self):
        from studiogan_tpu.models import stylegan3
        from studiogan_tpu.train.convert import _sg3_layer_plan
        cfg = _sg_cfg(backbone="stylegan3")
        G = stylegan3.Generator(z_dim=32, c_dim=10, w_dim=32,
                                img_resolution=32, img_channels=3,
                                num_classes=10, mapping_layers=2,
                                channel_base=1024, channel_max=64)
        plan = _sg3_layer_plan(cfg, channel_base=1024, channel_max=64)

        def rename(parts):
            parts = ["affine" if p == "affine_fc" else p for p in parts]
            return [plan[int(p[1:])] if p.startswith("L") and p[1:].isdigit()
                    else p for p in parts]

        z = jnp.zeros((2, 32))
        y = jnp.zeros((2,), jnp.int32)
        v = jax.device_get(G.init(
            {"params": jax.random.PRNGKey(0),
             "style_mix": jax.random.PRNGKey(2)}, z, y))
        sd = _sg_inverse_sd(v, rename=rename)
        converted, missing = convert_stylegan3_generator(
            sd, cfg, channel_base=1024, channel_max=64)
        assert not missing, missing
        _assert_tree_equal(v, converted)
        img = G.apply(converted, z, y, train=False)
        assert img.shape == (2, 32, 32, 3)
