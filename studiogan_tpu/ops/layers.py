"""Core layers: dense/conv/embedding with optional spectral norm, BN zoo,
SAGAN self-attention.

Reference behavior being matched (not ported):
  - spectral-norm layer factories, reference src/utils/ops.py:165-228
    (torch ``spectral_norm`` forward-pre-hook, eps=1e-6, 1 power iteration);
  - ``ConditionalBatchNorm2d``, reference src/utils/ops.py:14-28;
  - ``SelfAttention``, reference src/utils/ops.py:31-103;
  - ``init_weights`` ortho/N02/xavier, reference src/utils/ops.py:135-162.

TPU-first design notes:
  * NHWC layout throughout (TPU conv native layout).
  * Spectral-norm power-iteration vectors live in the ``sn`` variable
    collection and are updated functionally inside the train step — the
    reference relies on a stateful forward-pre-hook.
  * BatchNorm moments are reduced over the full (possibly sharded) batch;
    under GSPMD a batch mean IS the global mean, so the reference's three
    sync-BN implementations (torch SyncBatchNorm, custom DP sync-BN,
    plain BN) collapse into this one module.
  * Standing statistics (reference src/utils/misc.py:301) = running this
    module with ``mode='accumulate'``: cumulative moving average of
    moments, matching torch BN with momentum=None.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
Dtype = Any


# ---------------------------------------------------------------------------
# Initializers (reference src/utils/ops.py:135-162)
# ---------------------------------------------------------------------------

def make_initializer(name: str) -> Callable:
    """'ortho' | 'N02' | 'glorot'/'xavier' → flax kernel initializer."""
    if name == "ortho":
        return nn.initializers.orthogonal()
    if name == "N02":
        return nn.initializers.normal(stddev=0.02)
    if name in ("glorot", "xavier"):
        return nn.initializers.xavier_uniform()
    if name == "none":
        return nn.initializers.lecun_normal()
    raise ValueError(f"unknown initializer {name!r}")


def get_activation(name: str) -> Callable[[Array], Array]:
    """Activation registry (reference config.py:471-494)."""
    table = {
        "ReLU": jax.nn.relu,
        "Leaky_ReLU": partial(jax.nn.leaky_relu, negative_slope=0.1),
        "ELU": jax.nn.elu,
        "GELU": jax.nn.gelu,
        "Auto": jax.nn.relu,  # stylegan picks its own; placeholder
    }
    if name not in table:
        raise ValueError(f"unknown activation {name!r}")
    return table[name]


# ---------------------------------------------------------------------------
# Spectral normalization
# ---------------------------------------------------------------------------

def _l2n(x: Array, eps: float = 1e-6) -> Array:
    return x / (jnp.linalg.norm(x) + eps)


class _SNMixin:
    """Spectral norm over a weight viewed as (out, in_flat).

    Matches torch ``nn.utils.spectral_norm`` (1 power iteration per
    training forward, eps=1e-6, u/v persisted as buffers).  u/v live in
    the ``sn`` collection; they update only when that collection is
    mutable (i.e. inside a train step), mirroring train/eval semantics.
    """

    def spectral_normalize(self, w_mat: Array) -> Array:
        d_out, d_in = w_mat.shape
        u_var = self.variable(
            "sn", "u",
            lambda: _l2n(jax.random.normal(self.make_rng("params"), (d_out,))))
        v_var = self.variable(
            "sn", "v",
            lambda: _l2n(jax.random.normal(self.make_rng("params"), (d_in,))))
        u, v = u_var.value, v_var.value
        if self.is_mutable_collection("sn") and not self.is_initializing():
            w_ng = jax.lax.stop_gradient(w_mat.astype(jnp.float32))
            v = _l2n(w_ng.T @ u)
            u = _l2n(w_ng @ v)
            u_var.value, v_var.value = u, v
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = jnp.einsum("o,oi,i->", u, w_mat.astype(jnp.float32), v)
        return (w_mat.astype(jnp.float32) / sigma).astype(w_mat.dtype)


class Dense(nn.Module, _SNMixin):
    """Linear layer, optionally spectrally normalized (reference ops.py:205-212)."""
    features: int
    use_bias: bool = True
    sn: bool = False
    kernel_init: Callable = nn.initializers.orthogonal()
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        if self.sn:
            kernel = self.spectral_normalize(kernel.T).T
        dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(dtype), kernel.astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dtype)
        return y


class Conv2d(nn.Module, _SNMixin):
    """NHWC conv, optionally spectrally normalized (reference ops.py:165-188).

    ``padding`` is the symmetric torch-style int padding.
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    sn: bool = False
    groups: int = 1
    kernel_init: Callable = nn.initializers.orthogonal()
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init,
            (k, k, x.shape[-1] // self.groups, self.features))
        if self.sn:
            # torch views conv weight as (out, in*kh*kw)
            w_mat = kernel.transpose(3, 2, 0, 1).reshape(self.features, -1)
            kernel = (self.spectral_normalize(w_mat)
                      .reshape(self.features, x.shape[-1] // self.groups, k, k)
                      .transpose(2, 3, 1, 0))
        dtype = self.dtype or x.dtype
        p = self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            window_strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dtype)
        return y


class ConvTranspose2d(nn.Module, _SNMixin):
    """NHWC transposed conv (reference ops.py:175-198 ``deconv2d``: k=4 s=2 p=1)."""
    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    sn: bool = False
    kernel_init: Callable = nn.initializers.orthogonal()
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k, s, p = self.kernel_size, self.stride, self.padding
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, x.shape[-1], self.features))
        if self.sn:
            w_mat = kernel.transpose(3, 2, 0, 1).reshape(self.features, -1)
            kernel = (self.spectral_normalize(w_mat)
                      .reshape(self.features, x.shape[-1], k, k)
                      .transpose(2, 3, 1, 0))
        dtype = self.dtype or x.dtype
        # torch ConvTranspose2d(k,s,p): out = (i-1)*s - 2p + k.
        # lax.conv_transpose pad = k - 1 - p on each side reproduces it.
        pad = k - 1 - p
        y = jax.lax.conv_transpose(
            x.astype(dtype), kernel.astype(dtype),
            strides=(s, s), padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dtype)
        return y


class Embedding(nn.Module, _SNMixin):
    """Class-embedding table, optionally SN (reference ops.py:216-224)."""
    num_embeddings: int
    features: int
    sn: bool = False
    embedding_init: Callable = nn.initializers.orthogonal()

    @nn.compact
    def __call__(self, y: Array) -> Array:
        table = self.param(
            "embedding", self.embedding_init, (self.num_embeddings, self.features))
        if self.sn:
            table = self.spectral_normalize(table)
        if y.dtype in (jnp.int32, jnp.int64):
            return jnp.take(table, y, axis=0)
        # one-hot / soft labels
        return y @ table

    def attend(self, query: Array) -> Array:
        """query @ table.T — used by projection discriminators."""
        table = self.get_variable("params", "embedding")
        if self.sn:
            table = self.spectral_normalize(table)
        return query @ table.T


# ---------------------------------------------------------------------------
# BatchNorm zoo
# ---------------------------------------------------------------------------

class BatchNorm2d(nn.Module):
    """BatchNorm over (N, H, W) with torch semantics.

    Cross-replica by construction: the mean over a GSPMD-sharded batch
    axis is the global mean, so this single module covers the
    reference's plain BN / torch SyncBatchNorm / custom DP sync-BN
    (reference src/sync_batchnorm/batchnorm.py:74-176).

    Modes (threaded via module attrs at apply time):
      train=True            — batch moments, running stats EMA-updated.
      train=False           — running stats ("moving average" eval).
      accumulate=True       — batch moments + cumulative running average
                              (standing statistics, reference misc.py:301).
    ``batch_statistics`` eval (reference misc.py:63-106) = train=True with
    'batch_stats' immutable.
    """
    features: int
    eps: float = 1e-4
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    affine: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = True, accumulate: bool = False) -> Array:
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        n_tracked = self.variable("batch_stats", "n",
                                  lambda: jnp.zeros((), jnp.float32))

        if train or accumulate:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
            if self.is_mutable_collection("batch_stats") and not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                if accumulate:
                    cnt = n_tracked.value + 1.0
                    ra_mean.value = ra_mean.value + (mean - ra_mean.value) / cnt
                    ra_var.value = ra_var.value + (unbiased - ra_var.value) / cnt
                    n_tracked.value = cnt
                else:
                    m = self.momentum
                    ra_mean.value = (1 - m) * ra_mean.value + m * mean
                    ra_var.value = (1 - m) * ra_var.value + m * unbiased
                    n_tracked.value = n_tracked.value + 1.0
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * scale + bias
        return y.astype(x.dtype)


class ConditionalBatchNorm2d(nn.Module):
    """cBN: affine-free BN modulated by a label/latent embedding
    (reference src/utils/ops.py:14-28).

    gain = 1 + Dense(y), bias = Dense(y); Dense is SN'd when the
    generator uses SN (the reference binds MODULES.g_linear).
    """
    features: int
    sn: bool = False
    kernel_init: Callable = nn.initializers.orthogonal()

    @nn.compact
    def __call__(self, x: Array, y: Array, train: bool = True,
                 accumulate: bool = False) -> Array:
        gain = 1.0 + Dense(self.features, use_bias=False, sn=self.sn,
                           kernel_init=self.kernel_init, name="gain")(y)
        bias = Dense(self.features, use_bias=False, sn=self.sn,
                     kernel_init=self.kernel_init, name="bias")(y)
        h = BatchNorm2d(self.features, eps=1e-4, momentum=0.1, affine=False,
                        name="bn")(x, train=train, accumulate=accumulate)
        return h * gain[:, None, None, :] + bias[:, None, None, :]


# ---------------------------------------------------------------------------
# SAGAN self-attention (reference src/utils/ops.py:31-103)
# ---------------------------------------------------------------------------

class SelfAttention(nn.Module):
    """1x1-conv attention with 2x2 maxpool on phi/g and a learned residual
    scale ``sigma`` (init 0).  Dense einsum attention at CIFAR scale
    (<= 1k tokens) maps straight onto the MXU.  At 64x64 tokens the
    (N, 4096, 1024) attention map dominates activation memory (it is what
    OOMs BigGAN-128 at micro-batch 256), so large inputs switch to an
    EXACT blockwise path: queries are processed in chunks with a
    rematerialized chunk body — the keys are already maxpool-reduced, so
    each query row still sees every key and no online-softmax correction
    is needed.  q_chunk: 0 = auto (chunk 512 when tokens >= 4096),
    -1 = force dense, else the chunk size.

    On TPU the chunked path upgrades to a fused Pallas kernel
    (ops/pallas/attention_kernel.py): XLA cannot fuse
    matmul->softmax->matmul, so even chunk-wise the attention map makes
    several HBM round-trips — measured at ~30% of the whole BigGAN-128
    train step for ~2% of its FLOPs.  The kernel keeps each chunk's map
    in VMEM (exact same math, fwd and bwd).  ``impl``: "auto" (Pallas on
    TPU-like backends when running single-device, the chunked path is
    active, and the key row fits VMEM — under a multi-device mesh 'auto'
    falls back to the chunked scan, which GSPMD shards fine), "pallas"
    (expert force, even under a mesh), "chunked", or "einsum" (always
    the dense einsum, bypassing chunking); the STUDIOGAN_ATTN_IMPL env
    var overrides."""
    channels: int
    sn: bool = False
    kernel_init: Callable = nn.initializers.orthogonal()
    q_chunk: int = 0
    impl: str = "auto"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        conv = partial(Conv2d, kernel_size=1, stride=1, padding=0,
                       use_bias=False, sn=self.sn, kernel_init=self.kernel_init)
        theta = conv(c // 8, name="theta")(x)                     # (n,h,w,c/8)
        phi = nn.max_pool(conv(c // 8, name="phi")(x), (2, 2), (2, 2))
        g = nn.max_pool(conv(c // 2, name="g")(x), (2, 2), (2, 2))

        theta = theta.reshape(n, h * w, c // 8)
        phi = phi.reshape(n, (h * w) // 4, c // 8)
        g = g.reshape(n, (h * w) // 4, c // 2)

        def attend(th):
            a = jax.nn.softmax(
                jnp.einsum("nqc,nkc->nqk", th, phi,
                           preferred_element_type=jnp.float32), axis=-1
            ).astype(x.dtype)
            return jnp.einsum("nqk,nkc->nqc", a, g,
                              preferred_element_type=jnp.float32).astype(x.dtype)

        chunk = self.q_chunk
        if chunk == 0:
            chunk = 512 if h * w >= 4096 else -1
        impl = os.environ.get("STUDIOGAN_ATTN_IMPL", self.impl)
        chunked = chunk > 0 and h * w > chunk and (h * w) % chunk == 0
        if impl == "einsum":
            chunked = False   # force the dense path, as documented
        if impl.startswith("pallas") and jax.device_count() > 1:
            # pallas_call has no GSPMD partitioning rule: under a
            # multi-device mesh (dp/tp) the SPMD partitioner rejects it
            # ("side-effect HLO cannot have a replicated sharding") or
            # would silently replicate — fail loudly at trace time
            raise ValueError(
                "SelfAttention impl='pallas' cannot run under a "
                f"multi-device mesh ({jax.device_count()} devices): "
                "pallas_call is not GSPMD-partitionable. Use "
                "impl='chunked' (or 'auto', which picks the kernel only "
                "single-chip).")
        use_pallas = chunked and (
            impl.startswith("pallas")
            or (impl == "auto" and jax.default_backend() != "cpu"
                and jax.device_count() == 1
                and (h * w) // 4 <= 2048))   # key-row VMEM budget
        if use_pallas:
            if impl == "pallas_savemap":
                # experimental: bwd reuses the fwd's saved bf16 map
                # (scripts/profile_attention.py savemap for the trade)
                from studiogan_tpu.ops.pallas.attention_kernel import (
                    fused_pooled_attention_savemap as fused_attn)
            else:
                from studiogan_tpu.ops.pallas.attention_kernel import (
                    fused_pooled_attention as fused_attn)
            o = fused_attn(theta, phi, g, chunk)
        elif chunked:
            th_c = theta.reshape(n, (h * w) // chunk, chunk, c // 8)
            th_c = jnp.moveaxis(th_c, 1, 0)          # (chunks, n, chunk, c/8)
            _, o = jax.lax.scan(
                jax.checkpoint(lambda carry, th: (carry, attend(th))),
                None, th_c)
            o = jnp.moveaxis(o, 0, 1).reshape(n, h * w, c // 2)
        else:
            o = attend(theta)
        o = o.reshape(n, h, w, c // 2)
        o = conv(c, name="attn_out")(o)
        sigma = self.param("sigma", nn.initializers.zeros, (1,))
        return x + sigma * o
