"""DCGAN/InfoGAN CNN backbone, 32x32 only (parity with reference
src/models/deep_conv.py)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from studiogan_tpu.models.common import DiscriminatorHead
from studiogan_tpu.ops.layers import (
    BatchNorm2d, ConditionalBatchNorm2d, Conv2d, ConvTranspose2d, Dense,
    SelfAttention, get_activation, make_initializer,
)

Array = jax.Array
NA = "N/A"


class Generator(nn.Module):
    z_dim: int
    img_size: int
    apply_attn: bool
    attn_g_loc: tuple
    g_cond_mtd: str
    num_classes: int
    g_init: str = "N02"
    g_act_fn: str = "ReLU"
    apply_g_sn: bool = False
    info_type: str = NA
    g_info_injection: str = NA
    info_num_discrete_c: Any = NA
    info_dim_discrete_c: Any = NA
    info_num_conti_c: Any = NA

    @nn.compact
    def __call__(self, z: Array, label: Array | None, shared_label: Array | None = None,
                 train: bool = True) -> Array:
        assert self.img_size == 32, "deep_conv supports 32x32 only (reference deep_conv.py:42)"
        in_dims, out_dims = [512, 256, 128], [256, 128, 64]
        init = make_initializer(self.g_init)
        act = get_activation(self.g_act_fn)
        dense = lambda f, name: Dense(f, sn=self.apply_g_sn,  # noqa: E731
                                      kernel_init=init, name=name)

        affine_list = []
        if self.info_type != NA:
            if self.g_info_injection == "concat":
                z = dense(self.z_dim, "info_mix_linear")(z)
            elif self.g_info_injection == "cBN":
                z, z_info = z[:, :self.z_dim], z[:, self.z_dim:]
                affine_list.append(dense(self.z_dim, "info_proj_linear")(z_info))
        if self.g_cond_mtd != "W/O":
            affine_list.append(jax.nn.one_hot(label, self.num_classes))
        affine = jnp.concatenate(affine_list, axis=1) if affine_list else None
        conditional = self.g_cond_mtd == "cBN" or self.g_info_injection == "cBN"

        h = dense(in_dims[0] * 4 * 4, "linear0")(z)
        h = h.reshape(-1, 4, 4, in_dims[0])
        for i in range(len(in_dims)):
            h = ConvTranspose2d(out_dims[i], kernel_size=4, stride=2, padding=1,
                                sn=self.apply_g_sn, kernel_init=init,
                                name=f"block{i}_deconv")(h)
            if conditional:
                h = ConditionalBatchNorm2d(out_dims[i], sn=self.apply_g_sn,
                                           kernel_init=init,
                                           name=f"block{i}_bn")(h, affine, train=train)
            else:
                h = BatchNorm2d(out_dims[i], name=f"block{i}_bn")(h, train=train)
            h = act(h)
            if (i + 1) in self.attn_g_loc and self.apply_attn:
                h = SelfAttention(out_dims[i], sn=self.apply_g_sn,
                                  kernel_init=init, name=f"attn{i}")(h)

        h = Conv2d(3, kernel_size=3, stride=1, padding=1, sn=self.apply_g_sn,
                   kernel_init=init, name="conv4")(h)
        return jnp.tanh(h)


class Discriminator(nn.Module):
    img_size: int
    apply_d_sn: bool
    apply_attn: bool
    attn_d_loc: tuple
    d_cond_mtd: str
    aux_cls_type: str
    d_embed_dim: Any
    normalize_d_embed: bool
    num_classes: int
    d_init: str = "N02"
    d_act_fn: str = "ReLU"
    info_type: str = NA
    info_num_discrete_c: Any = NA
    info_dim_discrete_c: Any = NA
    info_num_conti_c: Any = NA

    @nn.compact
    def __call__(self, x: Array, label: Array | None, train: bool = True,
                 adc_fake: bool = False) -> dict:
        out_dims = [64, 128, 256]
        init = make_initializer(self.d_init)
        act = get_activation(self.d_act_fn)

        h = x
        for i, c in enumerate(out_dims):
            h = Conv2d(c, kernel_size=3, stride=1, padding=1, sn=self.apply_d_sn,
                       kernel_init=init, name=f"block{i}_conv0")(h)
            if not self.apply_d_sn:
                h = BatchNorm2d(c, name=f"block{i}_bn0")(h, train=train)
            h = act(h)
            h = Conv2d(c, kernel_size=4, stride=2, padding=1, sn=self.apply_d_sn,
                       kernel_init=init, name=f"block{i}_conv1")(h)
            if not self.apply_d_sn:
                h = BatchNorm2d(c, name=f"block{i}_bn1")(h, train=train)
            h = act(h)
            if (i + 1) in self.attn_d_loc and self.apply_attn:
                h = SelfAttention(c, sn=self.apply_d_sn,
                                  kernel_init=init, name=f"attn{i}")(h)

        h = Conv2d(512, kernel_size=3, stride=1, padding=1, sn=self.apply_d_sn,
                   kernel_init=init, name="conv1")(h)
        if not self.apply_d_sn:
            h = BatchNorm2d(512, name="bn1")(h, train=train)
        bottom_area = h.shape[1] * h.shape[2]
        h = act(h)
        h = jnp.sum(h, axis=(1, 2))

        return DiscriminatorHead(
            d_cond_mtd=self.d_cond_mtd, aux_cls_type=self.aux_cls_type,
            num_classes=self.num_classes, d_embed_dim=self.d_embed_dim,
            normalize_d_embed=self.normalize_d_embed, sn=self.apply_d_sn,
            kernel_init=init, info_type=self.info_type,
            info_num_discrete_c=self.info_num_discrete_c,
            info_dim_discrete_c=self.info_dim_discrete_c,
            info_num_conti_c=self.info_num_conti_c, name="head",
        )(h, label, adc_fake=adc_fake, bottom_area=bottom_area)
