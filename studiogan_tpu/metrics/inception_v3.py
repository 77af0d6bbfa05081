"""FID InceptionV3 in Flax (parity with reference src/metrics/inception_net.py,
the pytorch-fid port of the original TF 'pt_inception-2015-12-05' network).

Differences from stock torchvision InceptionV3 that matter for FID
(reference inception_net.py:135-218):
  * InceptionA / InceptionC / first InceptionE use average pooling with
    ``count_include_pad=False``;
  * the second InceptionE (Mixed_7c) uses MAX pooling in its pool branch;
  * fc has 1008 outputs (TF class layout).

Returns (pool3 2048-d features, 1008-way logits) like the reference's
``InceptionV3.forward``.  Weight loading: ``load_torch_state_dict``
converts a pytorch-fid ``pt_inception-2015-12-05-6726825d.pth`` state
dict to this module's params (weights must be provided on disk — this
environment has no network egress).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: tuple[int, int]
    stride: int = 1
    padding: tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(self.out_channels, self.kernel, strides=(self.stride,) * 2,
                    padding=(self.padding[0], self.padding[1]) if isinstance(
                        self.padding, tuple) else self.padding,
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return jax.nn.relu(x)


def _avg_pool3x3(x: Array, count_include_pad: bool) -> Array:
    """3x3 stride-1 avg pool, pad 1.  count_include_pad=False is the FID
    patch; torchvision's stock blocks use the torch default (True)."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=count_include_pad)


def _max_pool(x: Array, k=3, s=2, p=0) -> Array:
    return nn.max_pool(x, (k, k), strides=(s, s), padding=((p, p), (p, p)))


class InceptionA(nn.Module):
    pool_features: int
    count_include_pad: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool3x3(x, self.count_include_pad)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    count_include_pad: bool = False

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool3x3(x, self.count_include_pad)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # 'avg' (Mixed_7b, FID no-count-pad) | 'max' (FID Mixed_7c) |
    # 'avg_tv' (torchvision stock: count_include_pad=True)
    pool_mode: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_mode == "avg":
            bp = _avg_pool3x3(x, count_include_pad=False)
        elif self.pool_mode == "avg_tv":
            bp = _avg_pool3x3(x, count_include_pad=True)
        else:
            bp = _max_pool(x, k=3, s=1, p=1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Input: NHWC float in [-1, 1] at 299x299 (the LoadEvalModel
    normalization, reference preparation.py:52-53 + ops.py:258-263).
    Output: (features[N,2048], logits[N,1008]).

    variant="fid" (default) is the pytorch-fid TF port (patched pools,
    1008-way fc; reference inception_net.py:135-218).  variant="torchvision"
    is stock torchvision inception_v3 for the ``InceptionV3_torch``
    backbone (count-pad avg pools everywhere, avg-pool Mixed_7c, 1000-way
    fc, and the pretrained transform_input remap from ImageNet
    normalization; reference preparation.py:54-69)."""
    num_classes: int = 1008
    variant: str = "fid"
    transform_input: bool = False

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array]:
        tv = self.variant == "torchvision"
        if self.transform_input:  # torchvision pretrained-model input remap
            x = jnp.stack([x[..., 0] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5,
                           x[..., 1] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5,
                           x[..., 2] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5],
                          axis=-1)
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, count_include_pad=tv, name="Mixed_5b")(x)
        x = InceptionA(64, count_include_pad=tv, name="Mixed_5c")(x)
        x = InceptionA(64, count_include_pad=tv, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, count_include_pad=tv, name="Mixed_6b")(x)
        x = InceptionC(160, count_include_pad=tv, name="Mixed_6c")(x)
        x = InceptionC(160, count_include_pad=tv, name="Mixed_6d")(x)
        x = InceptionC(192, count_include_pad=tv, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg_tv" if tv else "avg", name="Mixed_7b")(x)
        x = InceptionE("avg_tv" if tv else "max", name="Mixed_7c")(x)
        feats = jnp.mean(x, axis=(1, 2))  # global average pool -> 2048
        logits = nn.Dense(self.num_classes, name="fc")(feats)
        return feats, logits


# ---------------------------------------------------------------------------
# torch state-dict conversion
# ---------------------------------------------------------------------------

def load_torch_state_dict(state_dict: dict) -> dict:
    """pytorch-fid pt_inception state dict -> flax variables dict.

    torch conv weight (O,I,H,W) -> HWIO; BN gamma/beta/mean/var map to
    flax BatchNorm scale/bias/mean/var; fc weight (O,I) -> (I,O).
    """
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    for key, val in state_dict.items():
        v = np.asarray(val)
        parts = key.split(".")
        if parts[0] == "AuxLogits":  # train-only aux head (torchvision)
            continue
        if parts[0] == "fc":
            if parts[1] == "weight":
                put(params, ("fc", "kernel"), v.T)
            else:
                put(params, ("fc", "bias"), v)
            continue
        # e.g. Mixed_5b.branch1x1.conv.weight / .bn.weight / .bn.running_mean
        name = parts[-1]
        if parts[-2] == "conv":
            put(params, tuple(parts[:-2]) + ("conv", "kernel"),
                v.transpose(2, 3, 1, 0))
        elif parts[-2] == "bn":
            base = tuple(parts[:-2])
            if name == "weight":
                put(params, base + ("bn", "scale"), v)
            elif name == "bias":
                put(params, base + ("bn", "bias"), v)
            elif name == "running_mean":
                put(batch_stats, base + ("bn", "mean"), v)
            elif name == "running_var":
                put(batch_stats, base + ("bn", "var"), v)
            # num_batches_tracked: dropped
    return {"params": params, "batch_stats": batch_stats}


def load_weights(path: str) -> dict:
    """Load pt_inception-2015-12-05-*.pth (torch) from disk and convert."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return load_torch_state_dict({k: v.numpy() for k, v in sd.items()})
