"""Shared building blocks for the CNN GAN backbones.

The reference duplicates the residual blocks and the entire
discriminator conditioning head across deep_conv.py / resnet.py /
big_resnet.py / big_resnet_deep_*.py / stylegan2.py (reference
src/models/big_resnet.py:307-427 and mirrors).  Here they are factored
once:

  * ``GenBlock`` / ``DiscBlock`` / ``DiscOptBlock`` — the up/down
    residual blocks shared by resnet & big_resnet (identical structure
    in the reference, src/models/resnet.py:15-60 vs big_resnet.py:15-42);
  * ``DiscriminatorHead`` — adversarial head + all 8 conditioning
    methods (W/O, AC, PD, MH, MD, 2C, D2DCE; SPD lives in stylegan) +
    TAC/ADC aux heads + InfoGAN Q heads
    (reference src/models/big_resnet.py:307-427).

All NHWC; images in [-1, 1].
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from studiogan_tpu.ops.layers import (
    BatchNorm2d, ConditionalBatchNorm2d, Conv2d, Dense, Embedding,
)

Array = jax.Array


# -- resolution → channel tables (architecture spec shared by resnet &
#    big_resnet; reference src/models/big_resnet.py:49-65, resnet.py:66-90,
#    identical D tables in both files) ------------------------------------

def g_dims(img_size: int, w: int) -> tuple[list[int], list[int]]:
    table = {
        32: ([w * 4, w * 4, w * 4], [w * 4, w * 4, w * 4]),
        64: ([w * 16, w * 8, w * 4, w * 2], [w * 8, w * 4, w * 2, w]),
        128: ([w * 16, w * 16, w * 8, w * 4, w * 2],
              [w * 16, w * 8, w * 4, w * 2, w]),
        256: ([w * 16, w * 16, w * 8, w * 8, w * 4, w * 2],
              [w * 16, w * 8, w * 8, w * 4, w * 2, w]),
        512: ([w * 16, w * 16, w * 8, w * 8, w * 4, w * 2, w],
              [w * 16, w * 8, w * 8, w * 4, w * 2, w, w]),
    }
    return table[img_size]


def d_dims(img_size: int, w: int) -> tuple[list[int], list[int], list[bool]]:
    table = {
        32: ([3, w * 2, w * 2, w * 2], [w * 2] * 4, [True, True, False, False]),
        64: ([3, w, w * 2, w * 4, w * 8], [w, w * 2, w * 4, w * 8, w * 16],
             [True] * 4 + [False]),
        128: ([3, w, w * 2, w * 4, w * 8, w * 16],
              [w, w * 2, w * 4, w * 8, w * 16, w * 16], [True] * 5 + [False]),
        256: ([3, w, w * 2, w * 4, w * 8, w * 8, w * 16],
              [w, w * 2, w * 4, w * 8, w * 8, w * 16, w * 16], [True] * 6 + [False]),
        512: ([3, w, w, w * 2, w * 4, w * 8, w * 8, w * 16],
              [w, w, w * 2, w * 4, w * 8, w * 8, w * 16, w * 16],
              [True] * 7 + [False]),
    }
    return table[img_size]


def upsample_nearest_2x(x: Array) -> Array:
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def avg_pool_2x(x: Array) -> Array:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


# ---------------------------------------------------------------------------


class GenBlock(nn.Module):
    """Upsampling residual generator block (reference resnet.py:15-60 /
    big_resnet.py:15-42).  ``conditional`` selects cBN vs plain BN."""
    out_channels: int
    conditional: bool
    sn: bool
    act: Callable
    kernel_init: Callable

    @nn.compact
    def __call__(self, x: Array, affine: Array | None, train: bool = True) -> Array:
        def bn(c, name):
            if self.conditional:
                return lambda t: ConditionalBatchNorm2d(
                    c, sn=self.sn, kernel_init=self.kernel_init, name=name
                )(t, affine, train=train)
            return lambda t: BatchNorm2d(c, name=name)(t, train=train)

        conv = lambda c, k, p, name: Conv2d(  # noqa: E731
            c, kernel_size=k, stride=1, padding=p, sn=self.sn,
            kernel_init=self.kernel_init, name=name)

        h = bn(x.shape[-1], "bn1")(x)
        h = self.act(h)
        h = upsample_nearest_2x(h)
        h = conv(self.out_channels, 3, 1, "conv1")(h)
        h = bn(self.out_channels, "bn2")(h)
        h = self.act(h)
        h = conv(self.out_channels, 3, 1, "conv2")(h)

        x0 = upsample_nearest_2x(x)
        x0 = conv(self.out_channels, 1, 0, "conv0")(x0)
        return h + x0


class DiscOptBlock(nn.Module):
    """First D block: conv-first residual + avgpool (reference
    resnet.py:172-205)."""
    out_channels: int
    apply_d_sn: bool
    act: Callable
    kernel_init: Callable

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        conv = lambda c, k, p, name: Conv2d(  # noqa: E731
            c, kernel_size=k, stride=1, padding=p, sn=self.apply_d_sn,
            kernel_init=self.kernel_init, name=name)
        h = conv(self.out_channels, 3, 1, "conv1")(x)
        if not self.apply_d_sn:
            h = BatchNorm2d(self.out_channels, name="bn1")(h, train=train)
        h = self.act(h)
        h = conv(self.out_channels, 3, 1, "conv2")(h)
        h = avg_pool_2x(h)

        x0 = avg_pool_2x(x)
        if not self.apply_d_sn:
            x0 = BatchNorm2d(x.shape[-1], name="bn0")(x0, train=train)
        x0 = conv(self.out_channels, 1, 0, "conv0")(x0)
        return h + x0


class DiscBlock(nn.Module):
    """Pre-activation D residual block (reference resnet.py:207-256).

    ``inplace_act``: the reference builds its activations with
    inplace=True (config.py:483-492, GELU excepted), which aliases the
    block input — see the shortcut note in __call__."""
    out_channels: int
    apply_d_sn: bool
    act: Callable
    kernel_init: Callable
    downsample: bool = True
    inplace_act: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        in_channels = x.shape[-1]
        ch_mismatch = in_channels != self.out_channels
        conv = lambda c, k, p, name: Conv2d(  # noqa: E731
            c, kernel_size=k, stride=1, padding=p, sn=self.apply_d_sn,
            kernel_init=self.kernel_init, name=name)

        h = x
        if not self.apply_d_sn:
            h = BatchNorm2d(in_channels, name="bn1")(h, train=train)
        h = self.act(h)
        # reference gotcha (big_resnet.py:221-237 / resnet.py:233-252):
        # the activation is ReLU(inplace=True) and `x0 = x` aliases the
        # input tensor, so when apply_d_sn (no bn1 reallocating x) the
        # shortcut actually receives act(x), NOT the raw input.  Verified
        # against the torch modules (tests/test_pth_export.py).
        x0 = h if (self.apply_d_sn and self.inplace_act) else x
        h = conv(self.out_channels, 3, 1, "conv1")(h)
        if not self.apply_d_sn:
            h = BatchNorm2d(self.out_channels, name="bn2")(h, train=train)
        h = self.act(h)
        h = conv(self.out_channels, 3, 1, "conv2")(h)
        if self.downsample:
            h = avg_pool_2x(h)
        if self.downsample or ch_mismatch:
            if not self.apply_d_sn:
                x0 = BatchNorm2d(in_channels, name="bn0")(x0, train=train)
            x0 = conv(self.out_channels, 1, 0, "conv0")(x0)
            if self.downsample:
                x0 = avg_pool_2x(x0)
        return h + x0


# ---------------------------------------------------------------------------


class DiscriminatorHead(nn.Module):
    """Adversarial + conditioning heads over the pooled feature ``h``.

    One implementation of what the reference re-states in every backbone
    (src/models/big_resnet.py:307-427, resnet.py mirrors, deep_conv.py
    mirrors, stylegan2.py:734-923).  Returns the reference's output-dict
    contract so the loss layer is backbone-agnostic.
    """
    d_cond_mtd: str
    aux_cls_type: str
    num_classes: int
    d_embed_dim: Any = "N/A"
    normalize_d_embed: bool = False
    sn: bool = True
    kernel_init: Callable = nn.initializers.orthogonal()
    info_type: str = "N/A"
    info_num_discrete_c: Any = "N/A"
    info_dim_discrete_c: Any = "N/A"
    info_num_conti_c: Any = "N/A"

    @nn.compact
    def __call__(self, h: Array, label: Array | None, adc_fake: bool = False,
                 bottom_area: int = 1) -> dict:
        dense = lambda f, b, name: Dense(  # noqa: E731
            f, use_bias=b, sn=self.sn, kernel_init=self.kernel_init, name=name)
        out = dict(h=h, embed=None, proxy=None, cls_output=None, label=label,
                   mi_embed=None, mi_proxy=None, mi_cls_output=None,
                   info_discrete_c_logits=None, info_conti_mu=None,
                   info_conti_var=None)

        # adversarial head
        if self.d_cond_mtd == "MH":
            adv = dense(1 + self.num_classes, True, "linear1")(h)
        elif self.d_cond_mtd == "MD":
            adv = dense(self.num_classes, True, "linear1")(h)
        else:
            adv = jnp.squeeze(dense(1, True, "linear1")(h), axis=-1)

        num_classes = self.num_classes
        if self.aux_cls_type == "ADC":
            # fake samples get odd labels, real get even (reference :382-386)
            num_classes *= 2
            label = label * 2 + (1 if adc_fake else 0)
            out["label"] = label

        # InfoGAN Q heads (spatially-averaged feature, reference :389-394)
        if self.info_type in ("discrete", "both"):
            q = self.info_num_discrete_c * self.info_dim_discrete_c
            out["info_discrete_c_logits"] = dense(q, False, "info_discrete_linear")(
                h / bottom_area)
        if self.info_type in ("continuous", "both"):
            q = self.info_num_conti_c
            out["info_conti_mu"] = dense(q, False, "info_conti_mu_linear")(h / bottom_area)
            out["info_conti_var"] = jnp.exp(
                dense(q, False, "info_conti_var_linear")(h / bottom_area))

        # class conditioning
        if self.d_cond_mtd == "AC":
            hh = h
            if self.normalize_d_embed:
                # the reference normalizes h only (its weight-normalize loop
                # rebinds the loop variable — a no-op we reproduce for parity,
                # reference big_resnet.py:397-400)
                hh = hh / (jnp.linalg.norm(hh, axis=1, keepdims=True) + 1e-12)
            out["cls_output"] = dense(num_classes, False, "linear2")(hh)
        elif self.d_cond_mtd == "PD":
            proxy = Embedding(num_classes, h.shape[-1], sn=self.sn,
                              embedding_init=self.kernel_init, name="embedding")(label)
            adv = adv + jnp.sum(proxy * h, axis=1)
        elif self.d_cond_mtd in ("2C", "D2DCE"):
            embed = dense(self.d_embed_dim, True, "linear2")(h)
            proxy = Embedding(num_classes, self.d_embed_dim, sn=self.sn,
                              embedding_init=self.kernel_init, name="embedding")(label)
            if self.normalize_d_embed:
                embed = embed / (jnp.linalg.norm(embed, axis=1, keepdims=True) + 1e-12)
                proxy = proxy / (jnp.linalg.norm(proxy, axis=1, keepdims=True) + 1e-12)
            out["embed"], out["proxy"] = embed, proxy
        elif self.d_cond_mtd == "MD":
            adv = jnp.take_along_axis(adv, label[:, None], axis=1)[:, 0]
        elif self.d_cond_mtd in ("W/O", "MH"):
            pass
        else:
            raise NotImplementedError(self.d_cond_mtd)

        # TAC twin-classifier heads (reference :407-419)
        if self.aux_cls_type == "TAC":
            if self.d_cond_mtd == "AC":
                hh = h
                if self.normalize_d_embed:
                    hh = hh / (jnp.linalg.norm(hh, axis=1, keepdims=True) + 1e-12)
                out["mi_cls_output"] = dense(num_classes, False, "linear_mi")(hh)
            elif self.d_cond_mtd in ("2C", "D2DCE"):
                mi_embed = dense(self.d_embed_dim, True, "linear_mi")(h)
                mi_proxy = Embedding(num_classes, self.d_embed_dim, sn=self.sn,
                                     embedding_init=self.kernel_init,
                                     name="embedding_mi")(label)
                if self.normalize_d_embed:
                    mi_embed = mi_embed / (jnp.linalg.norm(mi_embed, axis=1, keepdims=True) + 1e-12)
                    mi_proxy = mi_proxy / (jnp.linalg.norm(mi_proxy, axis=1, keepdims=True) + 1e-12)
                out["mi_embed"], out["mi_proxy"] = mi_embed, mi_proxy
            else:
                raise NotImplementedError

        out["adv_output"] = adv
        return out


def info_dim(MODEL) -> int:
    """Extra latent dims appended for InfoGAN (reference resnet.py:98-102)."""
    d = 0
    if MODEL.info_type in ("discrete", "both"):
        d += MODEL.info_num_discrete_c * MODEL.info_dim_discrete_c
    if MODEL.info_type in ("continuous", "both"):
        d += MODEL.info_num_conti_c
    return d
