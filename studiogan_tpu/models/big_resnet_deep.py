"""BigGAN-Deep backbones: 'legacy' (CompareGAN, reference
src/models/big_resnet_deep_legacy.py) and 'studiogan' (reference
src/models/big_resnet_deep_studiogan.py) in one module.

Bottleneck residual blocks (channel_ratio=4), depth-parameterized by
g_depth/d_depth.  Variant differences (reference diff):
  * G skip: legacy slices channels (x0 = x[..., :out]); studiogan uses a
    1x1 conv after the upsample;
  * D skip: legacy concatenates a (out-in)-channel 1x1 conv; studiogan
    uses a full 1x1 conv with an optblock (pool-first) ordering for the
    very first block;
  * studiogan's 32px D stem starts at d_conv_dim (legacy: 4x).
The affine vector = concat(shared embed, z) feeds both the bottom
linear and every cBN (legacy :152-170).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from studiogan_tpu.models.common import (
    DiscriminatorHead, avg_pool_2x, g_dims, upsample_nearest_2x,
)
from studiogan_tpu.ops.layers import (
    BatchNorm2d, ConditionalBatchNorm2d, Conv2d, Dense, Embedding,
    SelfAttention, get_activation, make_initializer,
)

Array = jax.Array
NA = "N/A"


class DeepGenBlock(nn.Module):
    out_channels: int
    upsample: bool
    variant: str
    sn: bool
    act: Any
    kernel_init: Any
    channel_ratio: int = 4

    @nn.compact
    def __call__(self, x: Array, affine: Array, train: bool = True) -> Array:
        in_channels = x.shape[-1]
        hidden = in_channels // self.channel_ratio
        conv = lambda c, k, p, name: Conv2d(  # noqa: E731
            c, kernel_size=k, stride=1, padding=p, sn=self.sn,
            kernel_init=self.kernel_init, name=name)
        cbn = lambda c, name: ConditionalBatchNorm2d(  # noqa: E731
            c, sn=self.sn, kernel_init=self.kernel_init, name=name)

        if self.variant == "legacy":
            x0 = x[..., :self.out_channels] if in_channels != self.out_channels else x
        else:
            x0 = x

        h = cbn(in_channels, "bn1")(x, affine, train=train)
        h = conv(hidden, 1, 0, "conv1")(self.act(h))
        h = cbn(hidden, "bn2")(h, affine, train=train)
        h = self.act(h)
        if self.upsample:
            h = upsample_nearest_2x(h)
        h = conv(hidden, 3, 1, "conv2")(h)
        h = cbn(hidden, "bn3")(h, affine, train=train)
        h = conv(hidden, 3, 1, "conv3")(self.act(h))
        h = cbn(hidden, "bn4")(h, affine, train=train)
        h = conv(self.out_channels, 1, 0, "conv4")(self.act(h))

        if self.upsample:
            x0 = upsample_nearest_2x(x0)
        if self.variant == "studiogan":
            x0 = conv(self.out_channels, 1, 0, "conv0")(x0)
        return h + x0


class DeepDiscBlock(nn.Module):
    out_channels: int
    downsample: bool
    variant: str
    optblock: bool
    sn: bool
    act: Any
    kernel_init: Any
    channel_ratio: int = 4
    inplace_act: bool = True   # reference acts are inplace except GELU

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        in_channels = x.shape[-1]
        hidden = self.out_channels // self.channel_ratio
        ch_mismatch = in_channels != self.out_channels
        conv = lambda c, k, p, name: Conv2d(  # noqa: E731
            c, kernel_size=k, stride=1, padding=p, sn=self.sn,
            kernel_init=self.kernel_init, name=name)

        # reference gotcha (big_resnet_deep_legacy.py:210-213 /
        # _studiogan.py:234-235): `x0 = x` aliases the input, which the
        # inplace activation then mutates — the shortcut actually
        # receives act(x) (GELU excepted: no inplace variant exists, so
        # the reference leaves x0 raw there; see config.py:483-492)
        a = self.act(x)
        x0 = a if self.inplace_act else x
        h = conv(hidden, 1, 0, "conv1")(a)
        h = conv(hidden, 3, 1, "conv2")(self.act(h))
        h = conv(hidden, 3, 1, "conv3")(self.act(h))
        if self.variant == "legacy":
            h = self.act(h)
            if self.downsample:
                h = avg_pool_2x(h)
            h = conv(self.out_channels, 1, 0, "conv4")(h)
        else:
            if self.downsample:
                h = avg_pool_2x(h)
            h = conv(self.out_channels, 1, 0, "conv4")(self.act(h))

        if self.variant == "legacy":
            if self.downsample:
                x0 = avg_pool_2x(x0)
            if ch_mismatch:
                extra = conv(self.out_channels - in_channels, 1, 0, "conv0")(x0)
                x0 = jnp.concatenate([x0, extra], axis=-1)
        else:
            if self.optblock:
                x0 = avg_pool_2x(x0)
                x0 = conv(self.out_channels, 1, 0, "conv0")(x0)
            elif self.downsample or ch_mismatch:
                x0 = conv(self.out_channels, 1, 0, "conv0")(x0)
                if self.downsample:
                    x0 = avg_pool_2x(x0)
        return h + x0


class Generator(nn.Module):
    variant: str
    z_dim: int
    g_shared_dim: int
    img_size: int
    g_conv_dim: int
    g_depth: int
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
        if self.g_cond_mtd != "W/O":
            if shared_label is None:
                shared_label = Embedding(self.num_classes, self.g_shared_dim,
                                         embedding_init=init, name="shared")(label)
            affine_list.append(shared_label)
        if affine_list:
            z = jnp.concatenate(affine_list + [z], axis=1)
        affine = z  # full conditioning vector drives every cBN (legacy :170)

        h = dense(in_dims[0] * bottom * bottom, "linear0")(z)
        h = h.reshape(-1, bottom, bottom, in_dims[0])
        for i in range(len(in_dims)):
            for g_index in range(self.g_depth):
                h = DeepGenBlock(
                    out_channels=in_dims[i] if g_index == 0 else out_dims[i],
                    upsample=g_index == (self.g_depth - 1),
                    variant=self.variant, sn=self.apply_g_sn, act=act,
                    kernel_init=init,
                    name=f"block{i}_{g_index}")(h, affine, train=train)
            if (i + 1) in self.attn_g_loc and self.apply_attn:
                h = SelfAttention(out_dims[i], sn=self.apply_g_sn,
                                  kernel_init=init, name=f"attn{i}")(h)

        h = BatchNorm2d(out_dims[-1], name="bn4")(h, train=train)
        h = act(h)
        h = Conv2d(3, kernel_size=3, stride=1, padding=1, sn=self.apply_g_sn,
                   kernel_init=init, name="conv5")(h)
        return jnp.tanh(h)


def _deep_d_dims(variant: str, img_size: int, w: int):
    ins = {
        32: [w * 4, w * 4, w * 4] if variant == "legacy" else [w, w * 4, w * 4],
        64: [w, w * 2, w * 4, w * 8],
        128: [w, w * 2, w * 4, w * 8, w * 16],
        256: [w, w * 2, w * 4, w * 8, w * 8, w * 16],
        512: [w, w, w * 2, w * 4, w * 8, w * 8, w * 16],
    }[img_size]
    outs = {
        32: [w * 4, w * 4, w * 4],
        64: [w * 2, w * 4, w * 8, w * 16],
        128: [w * 2, w * 4, w * 8, w * 16, w * 16],
        256: [w * 2, w * 4, w * 8, w * 8, w * 16, w * 16],
        512: [w, w * 2, w * 4, w * 8, w * 8, w * 16, w * 16],
    }[img_size]
    down = {32: [True, True, False, False], 64: [True] * 4 + [False],
            128: [True] * 5 + [False], 256: [True] * 6 + [False],
            512: [True] * 7 + [False]}[img_size]
    return ins, outs, down


class Discriminator(nn.Module):
    variant: str
    img_size: int
    d_conv_dim: int
    d_depth: int
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
        in_dims, out_dims, down = _deep_d_dims(self.variant, self.img_size,
                                               self.d_conv_dim)
        init = make_initializer(self.d_init)
        act = get_activation(self.d_act_fn)

        h = Conv2d(in_dims[0], kernel_size=3, stride=1, padding=1,
                   sn=self.apply_d_sn, kernel_init=init, name="input_conv")(x)
        for i in range(len(in_dims)):
            for d_index in range(self.d_depth):
                h = DeepDiscBlock(
                    out_channels=out_dims[i],
                    downsample=down[i] and d_index == 0,
                    variant=self.variant,
                    inplace_act=self.d_act_fn != "GELU",
                    optblock=self.variant == "studiogan" and i == 0 and d_index == 0,
                    sn=self.apply_d_sn, act=act, kernel_init=init,
                    name=f"block{i}_{d_index}")(h, train=train)
            if (i + 1) in self.attn_d_loc and self.apply_attn:
                h = SelfAttention(out_dims[i], sn=self.apply_d_sn,
                                  kernel_init=init, name=f"attn{i}")(h)

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
