"""Configuration system: YAML schema-compatible with PyTorch-StudioGAN.

The reference (src/config.py:30-876) mixes three concerns in one class:
(1) default option values, (2) YAML/CLI merging + validation, and
(3) factory binding (losses, layer constructors, optimizers, augments).

Here the config is pure data.  Factory binding lives in the modules that
own the factories (``studiogan_tpu.losses``, ``studiogan_tpu.ops``,
``studiogan_tpu.train.optim``, ``studiogan_tpu.aug``) keyed off config
fields, so the config can be serialized, hashed (for jit caching), and
diffed.  Field names and the YAML super-section names (DATA / MODEL /
LOSS / OPTIMIZATION / PRE / AUG / STYLEGAN / RUN) match the reference so
all 196 shipped YAML files load unchanged.
"""

from __future__ import annotations

import json
from typing import Any

import yaml

NA = "N/A"  # the reference's sentinel for "unset" (config.py throughout)


class Namespace:
    """Attribute-dict: one config super-section."""

    def __init__(self, **kw: Any):
        self.__dict__.update(kw)

    def __contains__(self, k: str) -> bool:
        return k in self.__dict__

    def __repr__(self) -> str:
        return f"Namespace({self.__dict__!r})"

    def to_dict(self) -> dict:
        return dict(self.__dict__)

    def keys(self):
        return self.__dict__.keys()


# ---------------------------------------------------------------------------
# Defaults.  Mirrors the option surface of reference config.py:37-394 and the
# RUN flags of reference main.py:28-110.
# ---------------------------------------------------------------------------

def _data_defaults() -> Namespace:
    return Namespace(
        name="CIFAR10",
        img_size=32,
        num_classes=10,
        img_channels=3,
    )


def _model_defaults() -> Namespace:
    return Namespace(
        backbone="resnet",
        g_cond_mtd="W/O",       # ["W/O", "cBN", "cAdaIN"]
        d_cond_mtd="W/O",       # ["W/O","AC","PD","MH","MD","2C","D2DCE","SPD"]
        aux_cls_type="W/O",     # ["W/O", "TAC", "ADC"]
        normalize_d_embed=False,
        d_embed_dim=NA,
        apply_g_sn=False,
        apply_d_sn=False,
        g_act_fn="ReLU",
        d_act_fn="ReLU",
        apply_attn=False,
        attn_g_loc=[NA],
        attn_d_loc=[NA],
        z_prior="gaussian",
        z_dim=128,
        w_dim=NA,
        g_shared_dim=NA,
        g_conv_dim=64,
        d_conv_dim=64,
        g_depth=NA,
        d_depth=NA,
        apply_g_ema=False,
        g_ema_decay=NA,
        g_ema_start=NA,
        g_init="ortho",
        d_init="ortho",
        info_type=NA,           # ["N/A","discrete","continuous","both"]
        g_info_injection=NA,    # ["N/A","concat","cBN"]
        info_num_discrete_c=NA,
        info_num_conti_c=NA,
        info_dim_discrete_c=NA,
    )


def _loss_defaults() -> Namespace:
    return Namespace(
        adv_loss="vanilla",
        cond_lambda=NA,
        tac_gen_lambda=NA,
        tac_dis_lambda=NA,
        mh_lambda=NA,
        apply_fm=False,
        fm_lambda=NA,
        apply_r1_reg=False,
        r1_place=NA,
        r1_lambda=NA,
        m_p=NA,
        temperature=NA,
        apply_wc=False,
        wc_bound=NA,
        apply_gp=False,
        gp_lambda=NA,
        apply_dra=False,
        dra_lambda=NA,
        apply_maxgp=False,
        maxgp_lambda=NA,
        apply_cr=False,
        cr_lambda=NA,
        apply_bcr=False,
        real_lambda=NA,
        fake_lambda=NA,
        apply_zcr=False,
        radius=NA,
        g_lambda=NA,
        d_lambda=NA,
        apply_lo=False,
        lo_alpha=NA,
        lo_beta=NA,
        lo_rate=NA,
        lo_lambda=NA,
        lo_steps4train=NA,
        lo_steps4eval=NA,
        apply_topk=False,
        topk_gamma=NA,
        topk_nu=NA,
        infoGAN_loss_discrete_lambda=NA,
        infoGAN_loss_conti_lambda=NA,
        apply_lecam=False,
        lecam_lambda=NA,
        lecam_ema_start_iter=NA,
        lecam_ema_decay=NA,
    )


def _optimization_defaults() -> Namespace:
    return Namespace(
        type_="Adam",
        batch_size=64,
        acml_steps=1,
        g_lr=0.0002,
        d_lr=0.0002,
        g_weight_decay=0.0,
        d_weight_decay=0.0,
        momentum=NA,
        nesterov=NA,
        alpha=NA,
        beta1=0.5,
        beta2=0.999,
        d_first=True,
        g_updates_per_step=1,
        d_updates_per_step=5,
        total_steps=100000,
        # Filled in by finalize(): world_size, basket_size
        world_size=1,
        basket_size=NA,
    )


def _pre_defaults() -> Namespace:
    return Namespace(apply_rflip=True)


def _aug_defaults() -> Namespace:
    return Namespace(
        apply_diffaug=False,
        apply_ada=False,
        ada_initial_augment_p=NA,
        ada_target=NA,
        ada_kimg=NA,
        ada_interval=NA,
        apply_apa=False,
        apa_initial_augment_p=NA,
        apa_target=NA,
        apa_kimg=NA,
        apa_interval=NA,
        cr_aug_type="W/O",
        bcr_aug_type="W/O",
        diffaug_type="W/O",
        ada_aug_type="W/O",
    )


def _stylegan_defaults() -> Namespace:
    return Namespace(
        stylegan3_cfg=NA,
        filtered_lrelu_impl="ref",  # "ref" | "pallas" (TPU-native fused
                                    # kernel, ops/pallas; envelope notes in
                                    # scripts/profile_filtered_lrelu.py)
        cond_type=["PD", "SPD", "2C", "D2DCE"],
        g_reg_interval=NA,
        d_reg_interval=NA,
        mapping_network=NA,
        style_mixing_p=NA,
        g_ema_kimg=NA,
        g_ema_rampup=NA,
        apply_pl_reg=False,
        pl_weight=NA,
        d_architecture=NA,
        d_epilogue_mbstd_group_size=NA,
        blur_init_sigma=NA,
    )


def _run_defaults() -> Namespace:
    """RUN options == the reference's CLI flags (main.py:28-110)."""
    return Namespace(
        entity=None,
        project=None,
        cfg_file=None,
        data_dir=None,
        save_dir="./",
        ckpt_dir=None,
        load_best=False,
        seed=-1,
        distributed_data_parallel=False,  # kept for YAML/CLI compat; SPMD either way
        backend="xla",                    # reference: nccl/gloo; here: XLA collectives
        total_nodes=1,
        current_node=0,
        num_workers=8,
        synchronized_bn=False,            # no-op under GSPMD: BN is cross-replica by construction
        mixed_precision=False,            # bfloat16 compute policy (no loss scaling on TPU)
        remat=False,                      # rematerialize G/D activations in the train step
                                          # (trade ~1 extra fwd for activation memory ->
                                          # bigger micro-batches; TPU-native knob)
        unroll_loops=False,               # unroll du/acml scans into straight-line HLO
        async_ckpt=False,                 # background-thread checkpoint writes
        truncation_factor=-1.0,
        truncation_cutoff=None,
        batch_statistics=False,
        standing_statistics=False,
        standing_max_batch=-1,
        standing_step=-1,
        freezeD=-1,
        langevin_sampling=False,
        langevin_rate=-1,
        langevin_noise_std=-1,
        langevin_decay=-1,
        langevin_decay_steps=-1,
        langevin_steps=-1,
        train=False,
        load_train_hdf5=False,
        load_data_in_memory=False,
        eval_metrics=["fid"],
        pre_resizer="wo_resize",
        post_resizer="legacy",
        num_eval=1,
        save_real_images=False,
        save_fake_images=False,
        save_fake_images_num=1,
        vis_fake_images=False,
        k_nearest_neighbor=False,
        interpolation=False,
        frequency_analysis=False,
        tsne_analysis=False,
        intra_class_fid=False,
        GAN_train=False,
        GAN_test=False,
        resume_classifier_train=False,
        semantic_factorization=False,
        num_semantic_axis=-1,
        maximum_variations=-1,
        empty_cache=False,   # accepted for CLI compat; meaningless on TPU
        print_freq=100,
        save_freq=2000,
        eval_backbone="InceptionV3_tf",
        ref_dataset="train",
        calc_is_ref_dataset=False,
    )


def _misc_defaults() -> Namespace:
    return Namespace(
        no_proc_data=["CIFAR10", "CIFAR100", "Tiny_ImageNet"],
        base_folders=["checkpoints", "figures", "logs", "moments", "samples", "values"],
        classifier_based_GAN=["AC", "2C", "D2DCE"],
        info_params=["info_discrete_linear", "info_conti_mu_linear", "info_conti_var_linear"],
        cas_setting={
            "CIFAR10": dict(batch_size=128, epochs=90, depth=32, lr=0.1, momentum=0.9,
                            weight_decay=1e-4, print_freq=1, bottleneck=True),
            "Tiny_ImageNet": dict(batch_size=128, epochs=90, depth=34, lr=0.1, momentum=0.9,
                                  weight_decay=1e-4, print_freq=1, bottleneck=True),
            "ImageNet": dict(batch_size=128, epochs=90, depth=34, lr=0.1, momentum=0.9,
                             weight_decay=1e-4, print_freq=1, bottleneck=True),
        },
    )


BACKBONES = ("deep_conv", "resnet", "big_resnet", "big_resnet_deep_legacy",
             "big_resnet_deep_studiogan", "stylegan2", "stylegan3")
G_COND_MTDS = ("W/O", "cBN", "cAdaIN")
D_COND_MTDS = ("W/O", "AC", "PD", "MH", "MD", "2C", "D2DCE", "SPD")
ADV_LOSSES = ("vanilla", "logistic", "least_square", "hinge", "wasserstein", "MH")
STYLEGAN_BACKBONES = ("stylegan2", "stylegan3")
ADA_AUG_TYPES = ("blit", "geom", "color", "filter", "noise", "cutout",
                 "bg", "bgc", "bgcf", "bgcfn", "bgcfnc")
SIMCLR_AUG_TYPES = ("simclr_basic", "simclr_hq", "simclr_hq_cutout", "byol")


class Configurations:
    """Load defaults, merge a YAML file, merge CLI flags, validate.

    YAML-compatible with every config under reference src/configs/ —
    unknown keys in the YAML are hard errors (reference config.py:400-409).
    """

    def __init__(self, cfg_file: str | None = None):
        self.DATA = _data_defaults()
        self.MODEL = _model_defaults()
        self.LOSS = _loss_defaults()
        self.OPTIMIZATION = _optimization_defaults()
        self.PRE = _pre_defaults()
        self.AUG = _aug_defaults()
        self.STYLEGAN = _stylegan_defaults()
        self.RUN = _run_defaults()
        self.MISC = _misc_defaults()
        self.super_cfgs = {
            "DATA": self.DATA, "MODEL": self.MODEL, "LOSS": self.LOSS,
            "OPTIMIZATION": self.OPTIMIZATION, "PRE": self.PRE, "AUG": self.AUG,
            "STYLEGAN": self.STYLEGAN, "RUN": self.RUN,
        }
        self.cfg_file = cfg_file
        if cfg_file is not None:
            self._overwrite_cfgs(cfg_file)
        self._finalized = False

    # -- merging ----------------------------------------------------------

    def _overwrite_cfgs(self, cfg_file: str) -> None:
        with open(cfg_file) as f:
            doc = yaml.safe_load(f) or {}
        for section, kv in doc.items():
            if section not in self.super_cfgs:
                raise AttributeError(f"Unknown config section {section!r} in {cfg_file}")
            ns = self.super_cfgs[section]
            for key, val in (kv or {}).items():
                if key not in ns:
                    raise AttributeError(
                        f"There does not exist '{section}.{key}' attribute in the config."
                    )
                setattr(ns, key, val)

    def update_cfgs(self, cfgs: dict, super: str = "RUN") -> None:
        ns = self.super_cfgs[super]
        for key, val in cfgs.items():
            setattr(ns, key, val)

    # -- derived values ----------------------------------------------------

    def finalize(self, world_size: int = 1) -> None:
        """Fill in derived fields (reference: main.py:133-143, loader.py:178-180,
        config.py:497-565 lazy-regularization lr/beta rescale)."""
        OPT, SG = self.OPTIMIZATION, self.STYLEGAN
        OPT.world_size = world_size
        OPT.basket_size = OPT.batch_size * OPT.acml_steps * OPT.d_updates_per_step

        if self.MODEL.backbone in STYLEGAN_BACKBONES:
            if SG.g_reg_interval == NA:
                SG.g_reg_interval = 4
            if SG.d_reg_interval == NA:
                SG.d_reg_interval = 16
            if OPT.type_ == "Adam" and not getattr(OPT, "_lazy_rescaled", False):
                g_ratio = SG.g_reg_interval / (SG.g_reg_interval + 1) if SG.g_reg_interval != 1 else 1.0
                d_ratio = SG.d_reg_interval / (SG.d_reg_interval + 1) if SG.d_reg_interval != 1 else 1.0
                OPT.g_lr *= g_ratio
                OPT.d_lr *= d_ratio
                OPT.g_betas = [OPT.beta1 ** g_ratio, OPT.beta2 ** g_ratio]
                OPT.d_betas = [OPT.beta1 ** d_ratio, OPT.beta2 ** d_ratio]
                OPT.adam_eps = 1e-8
                OPT._lazy_rescaled = True
        else:
            OPT.g_betas = [OPT.beta1, OPT.beta2]
            OPT.d_betas = [OPT.beta1, OPT.beta2]
            OPT.adam_eps = 1e-6
        self._finalized = True

    # -- validation ---------------------------------------------------------

    def check_compatability(self) -> None:
        """Cross-option contract (reference config.py:630-876)."""
        M, L, O, A, R, S, D = (self.MODEL, self.LOSS, self.OPTIMIZATION, self.AUG,
                               self.RUN, self.STYLEGAN, self.DATA)
        err = _Check()

        for item in R.eval_metrics:
            err(item in ["is", "fid", "prdc", "none"],
                "-metrics option can only contain is, fid, prdc or none.")
        err(M.backbone in BACKBONES, f"unknown backbone {M.backbone}")
        err(M.g_cond_mtd in G_COND_MTDS, f"unknown g_cond_mtd {M.g_cond_mtd}")
        err(M.d_cond_mtd in D_COND_MTDS, f"unknown d_cond_mtd {M.d_cond_mtd}")
        err(L.adv_loss in ADV_LOSSES, f"unknown adv_loss {L.adv_loss}")

        if R.load_data_in_memory:
            err(R.load_train_hdf5, "load_data_in_memory requires load_train_hdf5.")
        if R.langevin_sampling:
            err(M.z_prior == "gaussian", "Langevin sampling requires gaussian z prior.")
            err(not R.freezeD > -1, "Langevin sampling is not compatible with freezeD.")
        if R.freezeD > -1:
            err(R.ckpt_dir is not None, "freezeD requires a checkpoint to load (-ckpt).")
        if M.aux_cls_type != "W/O":
            err(M.d_cond_mtd in self.MISC.classifier_based_GAN,
                "TAC/ADC requires a classifier-based d_cond_mtd (AC, 2C, D2DCE).")
        if M.d_cond_mtd == "MH" or L.adv_loss == "MH":
            err(M.d_cond_mtd == "MH" and L.adv_loss == "MH",
                "MH loss and MH conditioning must be used together.")
        if M.d_cond_mtd in ("2C", "D2DCE"):
            err(M.d_embed_dim != NA, "2C/D2DCE requires d_embed_dim.")
            err(L.temperature != NA, "2C/D2DCE requires temperature.")
        if M.d_cond_mtd == "D2DCE":
            err(L.m_p != NA, "D2DCE requires m_p.")
        if M.info_type in ("discrete", "both"):
            err(M.info_num_discrete_c != NA and M.info_dim_discrete_c != NA,
                "discrete InfoGAN requires info_num_discrete_c and info_dim_discrete_c.")
        if M.info_type in ("continuous", "both"):
            err(M.info_num_conti_c != NA, "continuous InfoGAN requires info_num_conti_c.")
        if M.info_type != NA:
            err(M.info_type in ("discrete", "continuous", "both"),
                f"unknown info_type {M.info_type}")
            err(M.g_info_injection in ("concat", "cBN"),
                "InfoGAN requires g_info_injection in [concat, cBN].")
        if M.backbone == "deep_conv":
            err(D.img_size == 32, "deep_conv backbone supports 32x32 images only.")
        if L.apply_cr:
            err(A.cr_aug_type != "W/O", "CR requires cr_aug_type.")
            err(not L.apply_bcr, "CR and bCR cannot be applied together.")
        if L.apply_bcr:
            err(A.bcr_aug_type != "W/O", "bCR requires bcr_aug_type.")
        if A.apply_diffaug:
            err(A.diffaug_type != "W/O", "Please select a diffaug type.")
        if A.apply_ada:
            err(A.ada_aug_type in ADA_AUG_TYPES, "Please select an ADA-supported aug type.")
            err(not A.apply_apa or True, "")
        if A.apply_ada and A.apply_apa:
            err(A.ada_initial_augment_p == A.apa_initial_augment_p
                and A.ada_target == A.apa_target
                and A.ada_kimg == A.apa_kimg
                and A.ada_interval == A.apa_interval,
                "ADA and APA together require identical controller hyperparameters.")
        if L.apply_zcr:
            err(L.radius != NA, "zCR requires radius.")
        if L.apply_lo:
            err(not (M.backbone in STYLEGAN_BACKBONES), "latent optimization is not supported for StyleGAN.")
        if L.apply_topk:
            err(L.topk_gamma != NA and L.topk_nu != NA, "top-k requires topk_gamma and topk_nu.")
            err(0 < L.topk_nu <= 1 if L.topk_nu != NA else True, "topk_nu must be in (0, 1].")
        if L.apply_lecam:
            err(L.lecam_lambda != NA, "LeCam requires lecam_lambda.")
        if M.backbone in STYLEGAN_BACKBONES:
            err(M.g_cond_mtd in ("W/O", "cAdaIN"),
                "stylegan generator conditioning must be W/O or cAdaIN.")
            err(M.g_act_fn == "Auto" and M.d_act_fn == "Auto",
                "stylegan backbones use their own activation policy (Auto).")
            err(not R.standing_statistics, "standing statistics is BN-only; stylegan has no BN.")
        if M.backbone == "stylegan3":
            err(S.stylegan3_cfg in ("stylegan3-t", "stylegan3-r"),
                "stylegan3 requires stylegan3_cfg in [stylegan3-t, stylegan3-r].")
        if M.g_cond_mtd == "cAdaIN":
            err(M.backbone in STYLEGAN_BACKBONES, "cAdaIN is stylegan-only.")
        if M.d_cond_mtd == "SPD":
            err(M.backbone in STYLEGAN_BACKBONES, "SPD (stylegan projection) is stylegan-only.")
        if R.truncation_factor != -1.0 and R.truncation_factor is not None:
            err(R.truncation_factor > 0 or M.backbone in STYLEGAN_BACKBONES,
                "truncation_factor must be positive.")
        if R.standing_statistics:
            err(R.standing_max_batch > 0 and R.standing_step > 0,
                "standing statistics requires -std_max and -std_step.")
        err(O.batch_size % O.world_size == 0,
            "batch_size must be divisible by the number of devices.")
        if M.apply_g_ema and M.backbone not in STYLEGAN_BACKBONES:
            err(M.g_ema_decay != NA and M.g_ema_start != NA,
                "g_ema requires g_ema_decay and g_ema_start.")
            err(S.g_ema_kimg == NA and S.g_ema_rampup == NA,
                "g_ema_kimg/g_ema_rampup are stylegan-only hyperparameters.")
        if M.backbone in STYLEGAN_BACKBONES and M.apply_g_ema:
            err(S.g_ema_kimg != NA, "stylegan g_ema requires g_ema_kimg.")
            err(M.g_ema_decay == NA and M.g_ema_start == NA,
                "stylegan g_ema uses STYLEGAN.g_ema_kimg/g_ema_rampup, not "
                "MODEL.g_ema_decay/g_ema_start.")

        # ---- remaining reference contract (config.py:630-876); each check
        # maps to a reference assert — see PARITY.md for the full audit -----
        err(not (R.langevin_sampling and L.apply_lo),
            "Langevin sampling and latent optimization cannot be used "
            "simultaneously.")
        if M.g_depth != NA or M.d_depth != NA:
            err(M.backbone in ("big_resnet_deep_legacy",
                               "big_resnet_deep_studiogan"),
                "g_depth/d_depth are hyperparameters for the big_resnet_deep "
                "backbones.")
        if M.backbone in ("big_resnet_deep_legacy", "big_resnet_deep_studiogan"):
            err(bool(M.g_cond_mtd) and bool(M.d_cond_mtd),
                "big_resnet_deep backbones require g_cond_mtd and d_cond_mtd.")
        if R.langevin_sampling:
            err(R.vis_fake_images + R.k_nearest_neighbor + R.interpolation
                + R.frequency_analysis + R.tsne_analysis + R.intra_class_fid
                + R.semantic_factorization + R.GAN_train + R.GAN_test != 0,
                "Langevin sampling cannot be used for training only.")
        if not R.train and R.eval_metrics and "none" not in R.eval_metrics:
            err(R.ckpt_dir is not None,
                "Specify -ckpt CHECKPOINT_FOLDER to evaluate a GAN without "
                "training.")
        if R.intra_class_fid:
            err(bool(R.load_data_in_memory * R.load_train_hdf5)
                or not R.load_train_hdf5,
                "iFID with hdf5 requires load_data_in_memory.")
        if (R.vis_fake_images + R.k_nearest_neighbor + R.interpolation
                + R.intra_class_fid + R.GAN_train + R.GAN_test) >= 1:
            err(O.batch_size % 8 == 0, "batch_size should be divisible by 8.")
        if M.d_cond_mtd == "MH" or L.adv_loss == "MH":
            err(not L.apply_topk, "Top-k training is not supported for MHGAN.")
        if O.world_size > 1 and R.synchronized_bn:
            err(not R.batch_statistics,
                "batch_statistics cannot be used with synchronized_bn.")
        if O.world_size > 1 and not R.synchronized_bn:
            # semantic divergence vs the reference, documented on purpose:
            # under GSPMD the batch moments are computed over the GLOBAL
            # (mesh-wide) batch by construction, i.e. -sync_bn is
            # effectively always on.  The reference's DDP default
            # (per-replica BN stats, reference models/model.py:160-166)
            # is not reproducible here — strictly stronger statistics,
            # but multi-chip reproductions of reference runs should know.
            import warnings
            warnings.warn(
                "BatchNorm statistics are GLOBAL (cross-replica) under "
                "SPMD regardless of -sync_bn; the reference's per-replica"
                " default cannot be reproduced multi-chip (README #batch-"
                "normalization-semantics).")
        if D.name in ("CIFAR10", "CIFAR100"):
            err(R.ref_dataset in ("train", "test"),
                "CIFAR has no validation split; ref_dataset must be train or "
                "test.")
        if R.interpolation:
            err(M.backbone in ("big_resnet", "big_resnet_deep_legacy",
                               "big_resnet_deep_studiogan"),
                "interpolation analysis supports the big_resnet family only.")
        if R.semantic_factorization:
            err(R.num_semantic_axis > 0,
                "SeFa requires num_semantic_axis > 0.")
        if M.backbone in STYLEGAN_BACKBONES:
            err(not M.apply_g_sn and not M.apply_d_sn,
                "spectral normalization is not supported on stylegan "
                "backbones.")
            err(not M.apply_attn,
                "attention layers cannot be applied to the stylegan "
                "backbones.")
            if L.apply_r1_reg:
                err(L.r1_place in ("inside_loop", "outside_loop"),
                    "LOSS.r1_place should be inside_loop or outside_loop.")
            if S.d_epilogue_mbstd_group_size != NA:
                err(S.d_epilogue_mbstd_group_size
                    <= O.batch_size / max(O.world_size, 1),
                    "per-device batch must be >= d_epilogue_mbstd_group_size.")
            # the reference's stylegan unsupported-options sum (-1 == freezeD
            # default); interpolation is big_resnet-only, sefa/langevin etc.
            err(L.apply_fm + L.apply_gp + L.apply_dra + L.apply_maxgp
                + L.apply_zcr + L.apply_lo + R.synchronized_bn
                + R.batch_statistics + R.standing_statistics + R.freezeD
                + R.langevin_sampling + R.interpolation
                + R.semantic_factorization == -1,
                "fm/gp/dra/maxgp/zcr/lo/sync_bn/batch_stat/standing_stat/"
                "freezeD/langevin/interpolation/sefa are not supported for "
                "stylegan backbones.")
        else:
            err(M.g_act_fn != "Auto" and M.d_act_fn != "Auto",
                "act_fn 'Auto' is only defined for stylegan backbones.")
        if M.backbone == "stylegan3" and S.stylegan3_cfg == "stylegan3-r":
            err(S.blur_init_sigma != NA,
                "stylegan3-r requires blur_init_sigma.")
        if M.g_shared_dim != NA:
            err(M.backbone in ("big_resnet", "big_resnet_deep_legacy",
                               "big_resnet_deep_studiogan"),
                "hierarchical (shared) embedding is big_resnet-family only.")
        if R.GAN_train or R.GAN_test:
            err(M.d_cond_mtd != "W/O",
                "CAS is defined only for class-conditional GANs.")
        if M.info_type == NA:
            err(M.info_num_discrete_c == NA and M.info_num_conti_c == NA
                and M.info_dim_discrete_c == NA and M.g_info_injection == NA
                and L.infoGAN_loss_discrete_lambda == NA
                and L.infoGAN_loss_conti_lambda == NA,
                "info_* fields must be N/A when info_type is N/A.")
        if M.info_type in ("discrete", "both"):
            err(M.info_num_discrete_c != NA and M.info_num_discrete_c > 0
                and M.info_dim_discrete_c != NA and M.info_dim_discrete_c > 0,
                "info_num_discrete_c and info_dim_discrete_c must be > 0.")
            err(L.infoGAN_loss_discrete_lambda != NA,
                "discrete InfoGAN requires infoGAN_loss_discrete_lambda.")
        if M.info_type in ("continuous", "both"):
            err(M.info_num_conti_c != NA and M.info_num_conti_c > 0,
                "info_num_conti_c must be > 0.")
            err(L.infoGAN_loss_conti_lambda != NA,
                "continuous InfoGAN requires infoGAN_loss_conti_lambda.")
        if M.info_type != NA and M.backbone in STYLEGAN_BACKBONES:
            err(M.g_info_injection == "concat",
                "stylegan backbones only allow concat g_info_injection.")
        err(R.eval_backbone in ("InceptionV3_tf", "InceptionV3_torch",
                                "ResNet50_torch", "SwAV_torch", "DINO_torch",
                                "Swin-T_torch"),
            "eval_backbone should be one of InceptionV3_tf/InceptionV3_torch/"
            "ResNet50_torch/SwAV_torch/DINO_torch/Swin-T_torch.")
        err(R.post_resizer in ("legacy", "clean", "friendly"),
            "post_resizer should be legacy, clean or friendly.")
        err(R.pre_resizer in ("wo_resize", "nearest", "bilinear", "bicubic",
                              "lanczos"),
            "pre_resizer should be one of wo_resize/nearest/bilinear/bicubic/"
            "lanczos.")
        err(not (R.batch_statistics and R.standing_statistics),
            "batch_statistics and standing_statistics cannot be used "
            "together.")
        err(not (L.apply_cr and L.apply_zcr),
            "CR and zCR (ICR) cannot be applied together.")
        err(not (L.apply_gp and L.apply_dra and L.apply_maxgp),
            "GP, DRA and MaxGP cannot all be applied simultaneously.")
        err(R.save_freq % R.print_freq == 0,
            "save_freq should be divisible by print_freq.")
        err.raise_all()

    # -- serialization -------------------------------------------------------

    def to_dict(self) -> dict:
        return {name: ns.to_dict() for name, ns in self.super_cfgs.items()}

    def dumps(self) -> str:
        return json.dumps(self.to_dict(), default=str, indent=2, sort_keys=True)


class _Check:
    def __init__(self):
        self.failures: list[str] = []

    def __call__(self, ok: bool, msg: str) -> None:
        if not ok:
            self.failures.append(msg)

    def raise_all(self) -> None:
        if self.failures:
            raise ValueError("config incompatibility:\n  - " + "\n  - ".join(self.failures))
