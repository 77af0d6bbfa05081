"""Config system: YAML compat with every reference config + validation."""

import glob

import pytest

from studiogan_tpu.config import Configurations, NA

REF_CONFIGS = sorted(glob.glob("/root/reference/src/configs/**/*.yaml", recursive=True))


def test_defaults_load():
    cfg = Configurations()
    assert cfg.DATA.name == "CIFAR10"
    assert cfg.OPTIMIZATION.d_updates_per_step == 5
    assert cfg.MODEL.g_cond_mtd == "W/O"
    assert cfg.RUN.eval_backbone == "InceptionV3_tf"


@pytest.mark.skipif(not REF_CONFIGS, reason="reference configs not mounted")
def test_all_reference_yamls_load():
    """All 196 shipped YAMLs must parse against our schema with zero
    unknown-key errors (schema parity with reference config.py:37-394)."""
    assert len(REF_CONFIGS) > 150
    for path in REF_CONFIGS:
        Configurations(path)


@pytest.mark.skipif(not REF_CONFIGS, reason="reference configs not mounted")
def test_biggan_cifar_values():
    cfg = Configurations("/root/reference/src/configs/CIFAR10/BigGAN.yaml")
    assert cfg.MODEL.backbone == "big_resnet"
    assert cfg.MODEL.g_cond_mtd == "cBN"
    assert cfg.MODEL.d_cond_mtd == "PD"
    assert cfg.MODEL.apply_attn and cfg.MODEL.attn_g_loc == [2]
    assert cfg.LOSS.adv_loss == "hinge"
    cfg.finalize(world_size=1)
    assert cfg.OPTIMIZATION.basket_size == 64 * 1 * 5
    cfg.RUN.train = True
    cfg.check_compatability()


def test_unknown_yaml_key_rejected(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("MODEL:\n  not_a_real_option: 3\n")
    with pytest.raises(AttributeError):
        Configurations(str(bad))


def test_incompatible_options_rejected():
    cfg = Configurations()
    cfg.MODEL.d_cond_mtd = "MH"
    cfg.LOSS.adv_loss = "hinge"  # MH head requires MH loss
    cfg.finalize()
    with pytest.raises(ValueError):
        cfg.check_compatability()


def test_stylegan_lazy_reg_rescale():
    cfg = Configurations()
    cfg.MODEL.backbone = "stylegan2"
    cfg.MODEL.g_cond_mtd = "W/O"
    cfg.MODEL.g_act_fn = cfg.MODEL.d_act_fn = "Auto"
    cfg.OPTIMIZATION.g_lr = cfg.OPTIMIZATION.d_lr = 0.0025
    cfg.OPTIMIZATION.beta1, cfg.OPTIMIZATION.beta2 = 0.0, 0.99
    cfg.STYLEGAN.g_reg_interval = 4
    cfg.STYLEGAN.d_reg_interval = 16
    cfg.finalize()
    # reference config.py:540-548: lr *= r/(r+1), betas **= ratio
    assert abs(cfg.OPTIMIZATION.g_lr - 0.0025 * 4 / 5) < 1e-12
    assert abs(cfg.OPTIMIZATION.d_lr - 0.0025 * 16 / 17) < 1e-12
    assert abs(cfg.OPTIMIZATION.d_betas[1] - 0.99 ** (16 / 17)) < 1e-12
    # finalize must be idempotent on the rescale
    cfg.finalize()
    assert abs(cfg.OPTIMIZATION.g_lr - 0.0025 * 4 / 5) < 1e-12
