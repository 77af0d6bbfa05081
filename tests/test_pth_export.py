"""Reference .pth checkpoint EXPORT (round-4 verdict item 5): write the
reference's model={G|D|G_ema}-{when}-weights-step={n}.pth triplet
(reference src/utils/misc.py:394 / worker.py:940-983) and prove

  1. export -> import is the identity on our variable trees, and
  2. the REFERENCE torch modules load the files with strict=True and
     produce the same forward outputs as our flax models (true
     round-trip back into reference tooling).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from studiogan_tpu.train.convert import (  # noqa: E402
    load_reference_checkpoint, save_reference_checkpoint)

REF = "/root/reference/src"


@pytest.fixture(scope="module")
def ref_env():
    """Import the reference torch modules (CPU) with stubs for the
    packages absent in this environment (torchvision is only used by
    the reference for dataset IO / image saving, not model math)."""
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    import packaging.version
    tv = types.ModuleType("torchvision")
    tv.__path__ = []
    sys.modules.setdefault("torchvision", tv)
    for name, attrs in [
            ("torchvision.datasets",
             {"CIFAR10": object, "CIFAR100": object, "ImageFolder": object}),
            ("torchvision.utils", {"save_image": lambda *a, **k: None}),
            ("torchvision.transforms", {}),
    ]:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules.setdefault(name, mod)
        setattr(tv, name.split(".")[-1], mod)
    if "pkg_resources" not in sys.modules:
        fake = types.ModuleType("pkg_resources")
        fake.parse_version = packaging.version.parse
        sys.modules["pkg_resources"] = fake
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib
    big_resnet = importlib.import_module("models.big_resnet")
    ref_ops = importlib.import_module("utils.ops")
    return big_resnet, ref_ops


def _ref_modules(cfg, ref_ops):
    """Replicate reference config.define_modules (config.py:435-495)
    for the SN'd big_resnet family."""
    m = types.SimpleNamespace()
    assert cfg.MODEL.apply_g_sn and cfg.MODEL.apply_d_sn
    m.g_conv2d = ref_ops.snconv2d
    m.g_deconv2d = ref_ops.sndeconv2d
    m.g_linear = ref_ops.snlinear
    m.g_embedding = ref_ops.sn_embedding
    m.d_conv2d = ref_ops.snconv2d
    m.d_deconv2d = ref_ops.sndeconv2d
    m.d_linear = ref_ops.snlinear
    m.d_embedding = ref_ops.sn_embedding
    m.g_bn = ref_ops.ConditionalBatchNorm2d
    m.g_act_fn = torch.nn.ReLU(inplace=True)
    m.d_act_fn = torch.nn.ReLU(inplace=True)
    return m


def _trained_state(n_steps=2):
    from tests.test_engine import run_steps, tiny_biggan_cfg
    cfg = tiny_biggan_cfg()
    eng, state, _ = run_steps(cfg, n_steps)
    return cfg, eng, state


class TestExportImportIdentity:
    def test_roundtrip_exact(self, tmp_path):
        """export -> reference .pth -> import reproduces the exact
        variable trees (params, batch_stats, sn) for G, D and G_ema."""
        cfg, eng, state = _trained_state()
        paths = save_reference_checkpoint(
            jax.device_get(state), cfg, str(tmp_path), run_name="rt",
            best_fid=12.5)
        names = sorted(os.path.basename(p) for p in paths)
        step = int(np.asarray(state.step))
        assert names == sorted([
            f"model=G-current-weights-step={step}.pth",
            f"model=D-current-weights-step={step}.pth",
            f"model=G_ema-current-weights-step={step}.pth"])

        back = load_reference_checkpoint(str(tmp_path), cfg)
        for key, params, mstate in (
                ("g", state.g_params, state.g_state),
                ("d", state.d_params, state.d_state),
                ("g_ema", state.g_ema_params, state.g_ema_state)):
            assert f"{key}_missing" not in back, back.get(f"{key}_missing")
            want = {"params": jax.device_get(params),
                    **jax.device_get(mstate)}
            got = back[key]
            flat_w = jax.tree_util.tree_leaves_with_path(want)
            flat_g = {jax.tree_util.keystr(p): v for p, v in
                      jax.tree_util.tree_leaves_with_path(got)}
            for p, v in flat_w:
                k = jax.tree_util.keystr(p)
                assert k in flat_g, f"{key}: {k} lost in round-trip"
                np.testing.assert_array_equal(
                    np.asarray(v, np.float32),
                    np.asarray(flat_g[k], np.float32), err_msg=f"{key}:{k}")
            assert len(flat_g) == len(flat_w)

        meta = back["metadata"]
        assert meta["step"] == step and meta["best_fid"] == 12.5
        assert meta["seed"] == cfg.RUN.seed
        assert set(meta["lecam_emas"]) >= {"D_real", "D_fake", "decay"}

    def test_optimizer_skeleton_loadable_by_torch(self, tmp_path):
        """The exported Adam state dicts must be structurally loadable
        by torch.optim.Adam over the reference model's parameters."""
        pytest.importorskip("torch")
        cfg, eng, state = _trained_state()
        save_reference_checkpoint(jax.device_get(state), cfg, str(tmp_path))
        step = int(np.asarray(state.step))
        g = torch.load(os.path.join(
            tmp_path, f"model=G-current-weights-step={step}.pth"),
            weights_only=False)
        n_params = len([k for k in g["state_dict"]
                        if not k.endswith((".weight_u", ".weight_v",
                                           ".running_mean", ".running_var",
                                           ".num_batches_tracked"))])
        assert g["optimizer"]["param_groups"][0]["params"] == list(
            range(n_params))
        # a torch Adam over that many dummy params accepts the state dict
        dummy = [torch.nn.Parameter(torch.zeros(1)) for _ in range(n_params)]
        opt = torch.optim.Adam(dummy, lr=1.0)
        opt.load_state_dict(g["optimizer"])
        assert opt.param_groups[0]["lr"] == cfg.OPTIMIZATION.g_lr


class TestReferenceLoadsExport:
    def test_reference_modules_strict_load_and_forward_parity(
            self, ref_env, tmp_path):
        """The reference big_resnet Generator/Discriminator load our
        export with strict=True and reproduce our eval-mode forward."""
        big_resnet, ref_ops = ref_env
        cfg, eng, state = _trained_state()
        hs = jax.device_get(state)
        save_reference_checkpoint(hs, cfg, str(tmp_path))
        step = int(np.asarray(state.step))
        M = cfg.MODEL
        modules = _ref_modules(cfg, ref_ops)

        gen_t = big_resnet.Generator(
            z_dim=M.z_dim, g_shared_dim=M.g_shared_dim,
            img_size=cfg.DATA.img_size, g_conv_dim=M.g_conv_dim,
            apply_attn=M.apply_attn, attn_g_loc=M.attn_g_loc,
            g_cond_mtd=M.g_cond_mtd, num_classes=cfg.DATA.num_classes,
            g_init=False, g_depth="N/A", mixed_precision=False,
            MODULES=modules, MODEL=M)
        dis_t = big_resnet.Discriminator(
            img_size=cfg.DATA.img_size, d_conv_dim=M.d_conv_dim,
            apply_d_sn=M.apply_d_sn, apply_attn=M.apply_attn,
            attn_d_loc=M.attn_d_loc, d_cond_mtd=M.d_cond_mtd,
            aux_cls_type=M.aux_cls_type, d_embed_dim=M.d_embed_dim,
            normalize_d_embed=M.normalize_d_embed,
            num_classes=cfg.DATA.num_classes, d_init=False, d_depth="N/A",
            mixed_precision=False, MODULES=modules, MODEL=M)

        g_ckpt = torch.load(os.path.join(
            tmp_path, f"model=G_ema-current-weights-step={step}.pth"),
            weights_only=False)
        d_ckpt = torch.load(os.path.join(
            tmp_path, f"model=D-current-weights-step={step}.pth"),
            weights_only=False)
        gen_t.load_state_dict(g_ckpt["state_dict"], strict=True)
        dis_t.load_state_dict(d_ckpt["state_dict"], strict=True)
        gen_t.eval()
        dis_t.eval()

        rng = np.random.RandomState(0)
        z = rng.randn(4, M.z_dim).astype(np.float32)
        y = rng.randint(0, cfg.DATA.num_classes, (4,))
        with torch.no_grad():
            imgs_t = gen_t(torch.tensor(z), torch.tensor(y),
                           eval=True).numpy()
        imgs_j = np.asarray(eng.G.apply(
            {"params": hs.g_ema_params, **hs.g_ema_state},
            jnp.asarray(z), jnp.asarray(y), train=False))
        np.testing.assert_allclose(
            imgs_j.transpose(0, 3, 1, 2), imgs_t, atol=5e-5)

        x = rng.uniform(-1, 1, (4, 3, cfg.DATA.img_size,
                                cfg.DATA.img_size)).astype(np.float32)
        with torch.no_grad():
            d_out_t = dis_t(torch.tensor(x), torch.tensor(y), eval=True)
        d_out_j = eng.D.apply(
            {"params": hs.d_params, **hs.d_state},
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y),
            train=False)
        np.testing.assert_allclose(
            np.asarray(d_out_j["adv_output"]).ravel(),
            np.asarray(d_out_t["adv_output"]).ravel(), atol=5e-5)
