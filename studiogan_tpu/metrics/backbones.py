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
        h = nn.gelu(h, approximate=False)  # torch nn.GELU is exact erf
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


def convert_dino_vits(trunk_sd: dict, linear_sd: dict | None = None,
                      dim: int = 384, num_heads: int = 6,
                      feat_dim: int = 1536, num_classes: int = 1000) -> dict:
    """DINO ViT-S checkpoint (dino_deitsmall8_pretrain.pth naming:
    cls_token / pos_embed / patch_embed.proj / blocks.{i}.{norm1,attn.qkv,
    attn.proj,norm2,mlp.fc1,mlp.fc2} / norm) + the separate linear-eval
    head (dino_deitsmall8_linearweights.pth, ``module.linear.*``) ->
    DINOViTSmall flax variables (reference misc.py:632-691,
    preparation.py:70-75).

    Fused torch qkv (3*dim, dim) splits into flax MultiHeadDotProductAttention
    query/key/value kernels of shape (dim, heads, head_dim); attn.proj maps to
    the ``out`` kernel (heads, head_dim, dim).
    """
    hd = dim // num_heads
    sd = {k.replace("module.", "").replace("backbone.", ""): np.asarray(v)
          for k, v in trunk_sd.items()}
    params: dict = {"cls_token": sd["cls_token"].reshape(1, 1, dim),
                    "pos_embed": sd["pos_embed"],
                    "patch_embed": {
                        "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
                        "bias": sd["patch_embed.proj.bias"]},
                    "norm": {"scale": sd["norm.weight"],
                             "bias": sd["norm.bias"]}}
    i = 0
    while f"blocks.{i}.norm1.weight" in sd:
        p = f"blocks.{i}."
        qkv_w = sd[p + "attn.qkv.weight"]          # (3*dim, dim)
        qkv_b = sd[p + "attn.qkv.bias"]
        q_w, k_w, v_w = np.split(qkv_w, 3, axis=0)
        q_b, k_b, v_b = np.split(qkv_b, 3, axis=0)

        def _in(w, b):  # torch (out,in) -> flax (in, heads, head_dim)
            return {"kernel": w.T.reshape(dim, num_heads, hd),
                    "bias": b.reshape(num_heads, hd)}

        params[f"block{i}"] = {
            "norm1": {"scale": sd[p + "norm1.weight"],
                      "bias": sd[p + "norm1.bias"]},
            "attn": {"query": _in(q_w, q_b), "key": _in(k_w, k_b),
                     "value": _in(v_w, v_b),
                     "out": {"kernel": sd[p + "attn.proj.weight"].T.reshape(
                         num_heads, hd, dim),
                             "bias": sd[p + "attn.proj.bias"]}},
            "norm2": {"scale": sd[p + "norm2.weight"],
                      "bias": sd[p + "norm2.bias"]},
            "mlp_fc1": {"kernel": sd[p + "mlp.fc1.weight"].T,
                        "bias": sd[p + "mlp.fc1.bias"]},
            "mlp_fc2": {"kernel": sd[p + "mlp.fc2.weight"].T,
                        "bias": sd[p + "mlp.fc2.bias"]},
        }
        i += 1

    if linear_sd is not None:
        lin = {k.replace("module.linear.", "").replace("linear.", ""):
               np.asarray(v) for k, v in linear_sd.items()}
        params["linear"] = {"kernel": lin["weight"].T, "bias": lin["bias"]}
    else:
        params["linear"] = {
            "kernel": np.zeros((feat_dim, num_classes), np.float32),
            "bias": np.zeros((num_classes,), np.float32)}
    return {"params": params}


def convert_swav_resnet50(trunk_sd: dict, linear_sd: dict | None = None) -> dict:
    """SwAV checkpoint (swav_800ep_pretrain.pth.tar: torchvision resnet50
    trunk under ``module.`` prefixes, plus projection_head/prototypes which
    are dropped) + the separate linear classifier
    (``module.linear.*``) -> ResNet50 flax variables
    (reference preparation.py:54-65: hub resnet50 + SWAV_CLASSIFIER_URL fc).
    """
    sd = {}
    for k, v in trunk_sd.items():
        k = k.replace("module.", "")
        if k.startswith(("projection_head", "prototypes")):
            continue
        sd[k] = np.asarray(v)
    if linear_sd is not None:
        lin = {k.replace("module.linear.", "").replace("linear.", ""):
               np.asarray(v) for k, v in linear_sd.items()}
        sd["fc.weight"], sd["fc.bias"] = lin["weight"], lin["bias"]
    else:
        sd.setdefault("fc.weight", np.zeros((1000, 2048), np.float32))
        sd.setdefault("fc.bias", np.zeros((1000,), np.float32))
    return convert_resnet50_torch(sd)
