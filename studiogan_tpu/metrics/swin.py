"""Swin Transformer in Flax (parity with reference
src/metrics/swin_transformer.py — the Swin-B backbone behind
``Swin-T_torch``, loaded from swin_base_patch4_window7_224).

Returns (pooled features, logits) like the reference's forward.  Static
shifted-window attention masks and relative-position index tables are
precomputed with numpy at setup.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def window_partition(x: Array, ws: int) -> Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C) (reference swin:57-68)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows: Array, ws: int, h: int, w: int) -> Array:
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) indices into the (2ws-1)^2 bias table
    (reference swin:113-126)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))           # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]                # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows (reference swin:238-254)."""
    img_mask = np.zeros((1, h, w, 1))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wss, :] = cnt
            cnt += 1
    mask_windows = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    mask_windows = mask_windows.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x: Array, mask: np.ndarray | None = None) -> Array:
        b, n, c = x.shape
        ws, nh = self.window_size, self.num_heads
        head_dim = c // nh
        qkv = nn.Dense(c * 3, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, nh, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * head_dim ** -0.5) @ k.transpose(0, 1, 3, 2)

        table = self.param("relative_position_bias_table",
                           nn.initializers.normal(0.02),
                           ((2 * ws - 1) ** 2, nh))
        idx = _relative_position_index(ws).reshape(-1)
        bias = table[idx].reshape(n, n, nh).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b // nw, nw, nh, n, n) + \
                jnp.asarray(mask)[None, :, None, :, :]
            attn = attn.reshape(b, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    input_resolution: tuple
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h, w = self.input_resolution
        ws = min(self.window_size, min(h, w))
        shift = self.shift_size if ws < min(h, w) else 0
        b, n, c = x.shape

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x.reshape(b, h, w, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = _shift_attn_mask(h, w, ws, shift)
        else:
            mask = None
        windows = window_partition(x, ws)
        windows = WindowAttention(self.dim, ws, self.num_heads,
                                  name="attn")(windows, mask)
        x = window_reverse(windows, ws, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x.reshape(b, n, c)

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU is exact erf
        y = nn.Dense(c, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    input_resolution: tuple
    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h, w = self.input_resolution
        b, n, c = x.shape
        x = x.reshape(b, h, w, c)
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = x.reshape(b, (h // 2) * (w // 2), 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Swin-B by default (reference preparation.py:76-81)."""
    img_size: int = 224
    patch_size: int = 4
    num_classes: int = 1000
    embed_dim: int = 128
    depths: tuple = (2, 2, 18, 2)
    num_heads: tuple = (4, 8, 16, 32)
    window_size: int = 7
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array]:
        p = self.patch_size
        res = self.img_size // p
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                    name="patch_embed")(x)
        b = x.shape[0]
        x = x.reshape(b, res * res, self.embed_dim)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        for li, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            dim = self.embed_dim * 2 ** li
            layer_res = (res // 2 ** li, res // 2 ** li)
            for bi in range(depth):
                x = SwinBlock(dim, layer_res, heads,
                              window_size=self.window_size,
                              shift_size=0 if bi % 2 == 0 else self.window_size // 2,
                              mlp_ratio=self.mlp_ratio,
                              name=f"layer{li}_block{bi}")(x)
            if li < len(self.depths) - 1:
                x = PatchMerging(layer_res, dim, name=f"layer{li}_downsample")(x)

        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        feats = jnp.mean(x, axis=1)                       # (B, 8*embed_dim)
        logits = nn.Dense(self.num_classes, name="head")(feats)
        return feats, logits


def convert_swin_torch(sd: dict, depths=(2, 2, 18, 2)) -> dict:
    """Microsoft Swin checkpoint (swin_base_patch4_window7_224_22kto1k.pth
    ``model`` dict: patch_embed.proj / layers.{l}.blocks.{b}.{norm1,
    attn.{qkv,proj,relative_position_bias_table},norm2,mlp.{fc1,fc2}} /
    layers.{l}.downsample.{norm,reduction} / norm / head) ->
    SwinTransformer flax variables (reference preparation.py:76-81).

    ``relative_position_index`` and ``attn_mask`` buffers are recomputed
    statically by the flax module and skipped here.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {
        "patch_embed": {"kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
                        "bias": sd["patch_embed.proj.bias"]},
        "patch_norm": {"scale": sd["patch_embed.norm.weight"],
                       "bias": sd["patch_embed.norm.bias"]},
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
        "head": {"kernel": sd["head.weight"].T, "bias": sd["head.bias"]},
    }

    def ln(prefix):
        return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}

    def dense(prefix, use_bias=True):
        out = {"kernel": sd[prefix + ".weight"].T}
        if use_bias:
            out["bias"] = sd[prefix + ".bias"]
        return out

    for li, depth in enumerate(depths):
        for bi in range(depth):
            p = f"layers.{li}.blocks.{bi}"
            params[f"layer{li}_block{bi}"] = {
                "norm1": ln(p + ".norm1"),
                "attn": {
                    "qkv": dense(p + ".attn.qkv"),
                    "proj": dense(p + ".attn.proj"),
                    "relative_position_bias_table":
                        sd[p + ".attn.relative_position_bias_table"],
                },
                "norm2": ln(p + ".norm2"),
                "mlp_fc1": dense(p + ".mlp.fc1"),
                "mlp_fc2": dense(p + ".mlp.fc2"),
            }
        if li < len(depths) - 1:
            params[f"layer{li}_downsample"] = {
                "norm": ln(f"layers.{li}.downsample.norm"),
                "reduction": dense(f"layers.{li}.downsample.reduction",
                                   use_bias=False),
            }
    return {"params": params}
