"""BigGAN backbone (capability parity with reference src/models/big_resnet.py).

Generator: z split into (num_blocks+1) chunks; chunk 0 seeds the bottom
feature map, chunks 1..N concat with a shared class embedding to drive
per-block cBN affines (reference big_resnet.py:45-158).
Discriminator: pre-activation resnet trunk + global-sum pooling +
shared conditioning head (reference big_resnet.py:160-427).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from studiogan_tpu.models.common import (
    DiscBlock, DiscOptBlock, DiscriminatorHead, GenBlock, d_dims, g_dims, info_dim,
)
from studiogan_tpu.ops.layers import (
    BatchNorm2d, Conv2d, Dense, Embedding, SelfAttention, get_activation,
    make_initializer,
)

Array = jax.Array
NA = "N/A"


class Generator(nn.Module):
    z_dim: int
    g_shared_dim: int
    img_size: int
    g_conv_dim: int
    apply_attn: bool
    attn_g_loc: tuple
    g_cond_mtd: str
    num_classes: int
    g_init: str = "ortho"
    g_act_fn: str = "ReLU"
    apply_g_sn: bool = True
    info_type: str = NA
    g_info_injection: str = NA
    info_num_discrete_c: Any = NA
    info_dim_discrete_c: Any = NA
    info_num_conti_c: Any = NA

    @nn.compact
    def __call__(self, z: Array, label: Array | None, shared_label: Array | None = None,
                 train: bool = True) -> Array:
        in_dims, out_dims = g_dims(self.img_size, self.g_conv_dim)
        bottom = 4
        num_blocks = len(in_dims)
        chunk_size = self.z_dim // (num_blocks + 1)
        assert self.z_dim % (num_blocks + 1) == 0
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
                affine_list.append(dense(self.g_shared_dim, "info_proj_linear")(z_info))

        zs = jnp.split(z, num_blocks + 1, axis=1)
        z0, z_chunks = zs[0], zs[1:]

        if self.g_cond_mtd != "W/O":
            if shared_label is None:
                shared_label = Embedding(self.num_classes, self.g_shared_dim,
                                         embedding_init=init, name="shared")(label)
            affine_list.append(shared_label)
        if affine_list:
            affines = [jnp.concatenate(affine_list + [c], axis=1) for c in z_chunks]
        else:
            affines = list(z_chunks)

        h = dense(in_dims[0] * bottom * bottom, "linear0")(z0)
        h = h.reshape(-1, bottom, bottom, in_dims[0])
        counter = 0
        for i in range(num_blocks):
            h = GenBlock(out_dims[i], conditional=True, sn=self.apply_g_sn,
                         act=act, kernel_init=init,
                         name=f"block{i}")(h, affines[counter], train=train)
            counter += 1
            if (i + 1) in self.attn_g_loc and self.apply_attn:
                h = SelfAttention(out_dims[i], sn=self.apply_g_sn,
                                  kernel_init=init, name=f"attn{i}")(h)

        h = BatchNorm2d(out_dims[-1], name="bn4")(h, train=train)
        h = act(h)
        h = Conv2d(3, kernel_size=3, stride=1, padding=1, sn=self.apply_g_sn,
                   kernel_init=init, name="conv5")(h)
        return jnp.tanh(h)


class Discriminator(nn.Module):
    img_size: int
    d_conv_dim: int
    apply_d_sn: bool
    apply_attn: bool
    attn_d_loc: tuple
    d_cond_mtd: str
    aux_cls_type: str
    d_embed_dim: Any
    normalize_d_embed: bool
    num_classes: int
    d_init: str = "ortho"
    d_act_fn: str = "ReLU"
    info_type: str = NA
    info_num_discrete_c: Any = NA
    info_dim_discrete_c: Any = NA
    info_num_conti_c: Any = NA

    @nn.compact
    def __call__(self, x: Array, label: Array | None, train: bool = True,
                 adc_fake: bool = False) -> dict:
        in_dims, out_dims, down = d_dims(self.img_size, self.d_conv_dim)
        init = make_initializer(self.d_init)
        act = get_activation(self.d_act_fn)

        h = x
        for i in range(len(in_dims)):
            if i == 0:
                h = DiscOptBlock(out_dims[i], apply_d_sn=self.apply_d_sn, act=act,
                                 kernel_init=init, name=f"block{i}")(h, train=train)
            else:
                h = DiscBlock(out_dims[i], apply_d_sn=self.apply_d_sn, act=act,
                              kernel_init=init, downsample=down[i],
                              inplace_act=self.d_act_fn != "GELU",
                              name=f"block{i}")(h, train=train)
            if (i + 1) in self.attn_d_loc and self.apply_attn:
                h = SelfAttention(out_dims[i], sn=self.apply_d_sn,
                                  kernel_init=init, name=f"attn{i}")(h)

        bottom_area = h.shape[1] * h.shape[2]
        h = act(h)
        h = jnp.sum(h, axis=(1, 2))  # global sum pool (reference :355)

        return DiscriminatorHead(
            d_cond_mtd=self.d_cond_mtd, aux_cls_type=self.aux_cls_type,
            num_classes=self.num_classes, d_embed_dim=self.d_embed_dim,
            normalize_d_embed=self.normalize_d_embed, sn=self.apply_d_sn,
            kernel_init=init, info_type=self.info_type,
            info_num_discrete_c=self.info_num_discrete_c,
            info_dim_discrete_c=self.info_dim_discrete_c,
            info_num_conti_c=self.info_num_conti_c, name="head",
        )(h, label, adc_fake=adc_fake, bottom_area=bottom_area)
