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


def _cfg(**over):
    cfg = Configurations()
    cfg.RUN.train = True
    for k, v in over.items():
        ns, key = k.split(".")
        setattr(getattr(cfg, ns), key, v)
    cfg.finalize()
    return cfg


BAD_COMBOS = [
    # each entry maps to a reference assert (reference config.py:630-876);
    # see PARITY.md for the audit table
    {"RUN.load_data_in_memory": True},
    {"MODEL.backbone": "deep_conv", "DATA.img_size": 64},
    {"RUN.langevin_sampling": True, "LOSS.apply_lo": True,
     "RUN.vis_fake_images": True},
    {"MODEL.g_depth": 2},
    {"MODEL.d_depth": 2},
    {"RUN.langevin_sampling": True},  # analysis-only option
    {"RUN.freezeD": 2},  # needs -ckpt
    {"RUN.train": False},  # eval without ckpt
    {"RUN.intra_class_fid": True, "RUN.load_train_hdf5": True,
     "OPTIMIZATION.batch_size": 64},
    {"RUN.vis_fake_images": True, "OPTIMIZATION.batch_size": 62},
    {"MODEL.aux_cls_type": "TAC"},  # needs classifier-based d_cond_mtd
    {"MODEL.d_cond_mtd": "MH"},  # needs MH loss too
    {"MODEL.d_cond_mtd": "MH", "LOSS.adv_loss": "MH", "LOSS.apply_topk": True,
     "LOSS.topk_gamma": 0.99, "LOSS.topk_nu": 0.5},
    {"RUN.ref_dataset": "valid"},  # CIFAR has no valid split
    {"RUN.interpolation": True, "OPTIMIZATION.batch_size": 64},  # resnet bb
    {"RUN.semantic_factorization": True},  # num_semantic_axis -1
    {"MODEL.backbone": "stylegan3", "MODEL.g_act_fn": "Auto",
     "MODEL.d_act_fn": "Auto"},  # missing stylegan3_cfg
    {"MODEL.g_cond_mtd": "cAdaIN"},  # stylegan-only
    {"MODEL.d_cond_mtd": "SPD"},  # stylegan-only
    {"MODEL.backbone": "stylegan2", "MODEL.g_act_fn": "Auto",
     "MODEL.d_act_fn": "Auto", "MODEL.apply_g_sn": True},
    {"MODEL.backbone": "stylegan2", "MODEL.g_act_fn": "Auto",
     "MODEL.d_act_fn": "Auto", "MODEL.apply_attn": True,
     "MODEL.attn_g_loc": [2], "MODEL.attn_d_loc": [1]},
    {"MODEL.backbone": "stylegan2", "MODEL.g_act_fn": "Auto",
     "MODEL.d_act_fn": "Auto", "LOSS.apply_r1_reg": True,
     "LOSS.r1_lambda": 10.0},  # missing r1_place
    {"MODEL.backbone": "stylegan2", "MODEL.g_act_fn": "Auto",
     "MODEL.d_act_fn": "Auto", "LOSS.apply_gp": True, "LOSS.gp_lambda": 10.0},
    {"MODEL.g_act_fn": "Auto"},  # Auto outside stylegan
    {"MODEL.backbone": "stylegan3", "MODEL.g_act_fn": "Auto",
     "MODEL.d_act_fn": "Auto", "STYLEGAN.stylegan3_cfg": "stylegan3-r"},
    {"MODEL.apply_g_ema": True, "MODEL.g_ema_decay": 0.999,
     "MODEL.g_ema_start": 0, "STYLEGAN.g_ema_kimg": 10},
    {"MODEL.g_shared_dim": 128},  # big_resnet family only
    {"RUN.GAN_train": True, "OPTIMIZATION.batch_size": 64},  # W/O cond
    {"MODEL.info_num_discrete_c": 3},  # info fields w/o info_type
    {"MODEL.info_type": "discrete", "MODEL.info_num_discrete_c": 0,
     "MODEL.info_dim_discrete_c": 10, "MODEL.g_info_injection": "cBN",
     "LOSS.infoGAN_loss_discrete_lambda": 1.0},
    {"MODEL.info_type": "continuous"},  # missing conti fields
    {"RUN.eval_backbone": "VGG_torch"},
    {"RUN.post_resizer": "nearest"},
    {"RUN.pre_resizer": "box"},
    {"RUN.batch_statistics": True, "RUN.standing_statistics": True,
     "RUN.standing_max_batch": 32, "RUN.standing_step": 32},
    {"LOSS.apply_cr": True, "LOSS.apply_zcr": True, "AUG.cr_aug_type": "cr",
     "LOSS.cr_lambda": 1.0, "LOSS.radius": 0.1, "LOSS.g_lambda": 0.5,
     "LOSS.d_lambda": 0.5},
    {"LOSS.apply_gp": True, "LOSS.apply_dra": True, "LOSS.apply_maxgp": True,
     "LOSS.gp_lambda": 1.0, "LOSS.dra_lambda": 1.0, "LOSS.maxgp_lambda": 1.0},
    {"RUN.save_freq": 2050},  # not divisible by print_freq
]


@pytest.mark.parametrize("over", BAD_COMBOS,
                         ids=[" ".join(sorted(c)) for c in BAD_COMBOS])
def test_reference_contract_bad_combination_raises(over):
    cfg = _cfg(**over)
    with pytest.raises(ValueError):
        cfg.check_compatability()


def test_reference_contract_good_biggan_passes():
    cfg = _cfg(**{"MODEL.backbone": "big_resnet", "MODEL.g_cond_mtd": "cBN",
                  "MODEL.d_cond_mtd": "PD", "MODEL.g_shared_dim": 128,
                  "MODEL.apply_g_ema": True, "MODEL.g_ema_decay": 0.9999,
                  "MODEL.g_ema_start": 1000})
    cfg.check_compatability()
