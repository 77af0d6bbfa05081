"""Additional eval backbones in Flax: ResNet50 (torchvision-compatible,
used by ResNet50_torch and SwAV_torch) and DINO ViT-S (reference
src/metrics/vit.py).  Weight converters accept the corresponding torch
state dicts (torch-hub downloads are impossible in this environment;
drop the .pth files into STUDIOGAN_WEIGHTS_DIR).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


# ---------------------------------------------------------------------------
# ResNet50 (torchvision layout: conv1/bn1/layer{1-4}/fc)
# ---------------------------------------------------------------------------

class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        bn = partial(nn.BatchNorm, use_running_average=True, epsilon=1e-5)
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = jax.nn.relu(bn(name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=1, use_bias=False, name="conv2")(out)
        out = jax.nn.relu(bn(name="bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = bn(name="bn3")(out)
        identity = x
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               name="downsample_conv")(x)
            identity = bn(name="downsample_bn")(identity)
        return jax.nn.relu(out + identity)


class ResNet50(nn.Module):
    """Returns (penultimate 2048-d features, 1000-way logits) — the
    reference captures features via an fc pre-hook (preparation.py:54-69)."""
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = jax.nn.relu(nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                     name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for li, (planes, blocks, stride) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)], start=1):
            for bi in range(blocks):
                x = Bottleneck(planes, stride=stride if bi == 0 else 1,
                               downsample=bi == 0,
                               name=f"layer{li}_{bi}")(x)
        feats = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(self.num_classes, name="fc")(feats)
        return feats, logits


def convert_resnet50_torch(sd: dict) -> dict:
    """torchvision resnet50 state dict -> flax variables."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, v):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v

    def bn(dst, prefix, name):
        put(params, dst + (name, "scale"), np.asarray(sd[prefix + ".weight"]))
        put(params, dst + (name, "bias"), np.asarray(sd[prefix + ".bias"]))
        put(stats, dst + (name, "mean"), np.asarray(sd[prefix + ".running_mean"]))
        put(stats, dst + (name, "var"), np.asarray(sd[prefix + ".running_var"]))

    def conv(dst, prefix, name):
        put(params, dst + (name, "kernel"),
            np.asarray(sd[prefix + ".weight"]).transpose(2, 3, 1, 0))

    conv((), "conv1", "conv1")
    bn((), "bn1", "bn1")
    layout = [(1, 3), (2, 4), (3, 6), (4, 3)]
    for li, blocks in layout:
        for bi in range(blocks):
            src = f"layer{li}.{bi}"
            dst = (f"layer{li}_{bi}",)
            for ci in (1, 2, 3):
                conv(dst, f"{src}.conv{ci}", f"conv{ci}")
                bn(dst, f"{src}.bn{ci}", f"bn{ci}")
            if f"{src}.downsample.0.weight" in sd:
                conv(dst, f"{src}.downsample.0", "downsample_conv")
                bn(dst, f"{src}.downsample.1", "downsample_bn")
    put(params, ("fc", "kernel"), np.asarray(sd["fc.weight"]).T)
    put(params, ("fc", "bias"), np.asarray(sd["fc.bias"]))
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# DINO ViT-S (reference src/metrics/vit.py: vit_small patch8, the eval
# feature = concat of the last-4 blocks' CLS tokens; linear head on top)
# ---------------------------------------------------------------------------

class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        return x + h


class DINOViTSmall(nn.Module):
    """ViT-S/8 trunk; returns (features = concat last-4 CLS tokens [1536],
    logits via the DINO linear classifier) (reference vit.py:121-240,
    preparation.py:70-75 num_last_blocks=4)."""
    patch_size: int = 8
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    num_last_blocks: int = 4
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array]:
        n, h, w, _ = x.shape
        p = self.patch_size
        x = nn.Conv(self.dim, (p, p), strides=(p, p), name="patch_embed")(x)
        x = x.reshape(n, -1, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, self.dim)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, x.shape[1], self.dim))
        x = x + pos
        # DINO's get_intermediate_layers applies the SAME final norm to
        # every collected block output (reference vit.py:199-214)
        norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        cls_tokens = []
        for i in range(self.depth):
            x = ViTBlock(self.dim, self.num_heads, name=f"block{i}")(x)
            if i >= self.depth - self.num_last_blocks:
                cls_tokens.append(norm(x)[:, 0])
        feats = jnp.concatenate(cls_tokens, axis=-1)
        logits = nn.Dense(self.num_classes, name="linear")(feats)
        return feats, logits
