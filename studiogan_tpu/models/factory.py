"""Backbone factory (parity with reference src/models/model.py:19-154).

The reference dynamically imports ``models/{backbone}.py`` and
instantiates Generator/Discriminator plus an EMA copy.  Here EMA weights
are a pytree copy handled by the train state (studiogan_tpu/train), so
the factory only returns the two modules.
"""

from __future__ import annotations

import flax.linen as nn

NA = "N/A"


def _common_d_kwargs(cfg) -> dict:
    M = cfg.MODEL
    return dict(
        img_size=cfg.DATA.img_size,
        apply_d_sn=M.apply_d_sn,
        apply_attn=M.apply_attn,
        attn_d_loc=tuple(loc for loc in M.attn_d_loc if loc != NA),
        d_cond_mtd=M.d_cond_mtd,
        aux_cls_type=M.aux_cls_type,
        d_embed_dim=M.d_embed_dim,
        normalize_d_embed=M.normalize_d_embed,
        num_classes=cfg.DATA.num_classes,
        d_init=M.d_init,
        d_act_fn=M.d_act_fn,
        info_type=M.info_type,
        info_num_discrete_c=M.info_num_discrete_c,
        info_dim_discrete_c=M.info_dim_discrete_c,
        info_num_conti_c=M.info_num_conti_c,
    )


def _common_g_kwargs(cfg) -> dict:
    M = cfg.MODEL
    return dict(
        z_dim=M.z_dim,
        img_size=cfg.DATA.img_size,
        apply_attn=M.apply_attn,
        attn_g_loc=tuple(loc for loc in M.attn_g_loc if loc != NA),
        g_cond_mtd=M.g_cond_mtd,
        num_classes=cfg.DATA.num_classes,
        g_init=M.g_init,
        g_act_fn=M.g_act_fn,
        apply_g_sn=M.apply_g_sn,
        info_type=M.info_type,
        g_info_injection=M.g_info_injection,
        info_num_discrete_c=M.info_num_discrete_c,
        info_dim_discrete_c=M.info_dim_discrete_c,
        info_num_conti_c=M.info_num_conti_c,
    )


def build_generator(cfg) -> nn.Module:
    backbone = cfg.MODEL.backbone
    if backbone == "deep_conv":
        from studiogan_tpu.models import deep_conv
        kw = _common_g_kwargs(cfg)
        return deep_conv.Generator(**kw)
    if backbone == "resnet":
        from studiogan_tpu.models import resnet
        return resnet.Generator(g_conv_dim=cfg.MODEL.g_conv_dim, **_common_g_kwargs(cfg))
    if backbone == "big_resnet":
        from studiogan_tpu.models import big_resnet
        return big_resnet.Generator(g_shared_dim=cfg.MODEL.g_shared_dim,
                                    g_conv_dim=cfg.MODEL.g_conv_dim,
                                    **_common_g_kwargs(cfg))
    if backbone in ("big_resnet_deep_legacy", "big_resnet_deep_studiogan"):
        from studiogan_tpu.models import big_resnet_deep
        return big_resnet_deep.Generator(
            variant="legacy" if backbone.endswith("legacy") else "studiogan",
            g_shared_dim=cfg.MODEL.g_shared_dim, g_conv_dim=cfg.MODEL.g_conv_dim,
            g_depth=cfg.MODEL.g_depth, **_common_g_kwargs(cfg))
    if backbone == "stylegan2":
        from studiogan_tpu.models import stylegan2
        return stylegan2.make_generator(cfg)
    if backbone == "stylegan3":
        from studiogan_tpu.models import stylegan3
        return stylegan3.make_generator(cfg)
    raise NotImplementedError(f"backbone {backbone!r}")


def build_discriminator(cfg) -> nn.Module:
    backbone = cfg.MODEL.backbone
    if backbone == "deep_conv":
        from studiogan_tpu.models import deep_conv
        return deep_conv.Discriminator(**_common_d_kwargs(cfg))
    if backbone == "resnet":
        from studiogan_tpu.models import resnet
        return resnet.Discriminator(d_conv_dim=cfg.MODEL.d_conv_dim,
                                    **_common_d_kwargs(cfg))
    if backbone == "big_resnet":
        from studiogan_tpu.models import big_resnet
        return big_resnet.Discriminator(d_conv_dim=cfg.MODEL.d_conv_dim,
                                        **_common_d_kwargs(cfg))
    if backbone in ("big_resnet_deep_legacy", "big_resnet_deep_studiogan"):
        from studiogan_tpu.models import big_resnet_deep
        return big_resnet_deep.Discriminator(
            variant="legacy" if backbone.endswith("legacy") else "studiogan",
            d_conv_dim=cfg.MODEL.d_conv_dim, d_depth=cfg.MODEL.d_depth,
            **_common_d_kwargs(cfg))
    if backbone in ("stylegan2", "stylegan3"):
        # StyleGAN3 reuses the StyleGAN2 D (reference models/model.py:65)
        from studiogan_tpu.models import stylegan2
        return stylegan2.make_discriminator(cfg)
    raise NotImplementedError(f"backbone {backbone!r}")
