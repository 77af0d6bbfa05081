"""StyleGAN2 in Flax, NHWC (capability parity with reference
src/models/stylegan2.py, the NVIDIA implementation + StudioGAN's
conditioning heads grafted at stylegan2.py:734-923).

TPU-native notes:
  * ``modulated_conv2d`` uses the input-scale / output-demodulate
    formulation (the reference's ``fused_modconv=False`` path,
    stylegan2.py:64-79) — mathematically identical to the grouped-conv
    trick but keeps a single shared-weight conv that XLA tiles onto the
    MXU; no batch-sized group counts.
  * up/down-sampling decomposes into ``upfirdn2d`` + plain conv (the
    linear ops commute); XLA fuses the FIR into the surrounding conv.
  * Stateful buffers (mapping w_avg) live in the ``stats_ema``
    collection, fixed noise in ``buffers`` — both functional.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from studiogan_tpu.ops.bias_act import activation_funcs, bias_act
from studiogan_tpu.ops.upfirdn2d import downsample2d, setup_filter, upsample2d

Array = jax.Array
NA = "N/A"


def normalize_2nd_moment(x: Array, axis: int = -1, eps: float = 1e-8) -> Array:
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


class FullyConnectedLayer(nn.Module):
    """Equalized-lr dense (reference stylegan2.py:101-131; the
    ``weight_init`` / vector ``bias_init`` extensions match stylegan3's
    variant, reference stylegan3.py:67-105)."""
    features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: Any = 0.0
    weight_init: float = 1.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        w = self.param(
            "weight",
            nn.initializers.normal(max(self.weight_init, 1e-20) / self.lr_multiplier)
            if self.weight_init != 0 else nn.initializers.zeros,
            (self.features, in_features))
        w = w * (self.lr_multiplier / math.sqrt(in_features))
        b = None
        if self.use_bias:
            bias_init = np.broadcast_to(
                np.asarray(self.bias_init, np.float32), (self.features,))
            b = self.param("bias",
                           lambda _rng, _shape: jnp.asarray(
                               bias_init / self.lr_multiplier),
                           (self.features,))
            b = b * self.lr_multiplier
        x = x @ w.T.astype(x.dtype)
        return bias_act(x, None if b is None else b.astype(x.dtype),
                        act=self.activation)


def _conv2d(x: Array, w_oihw: Array, stride: int = 1, padding: int = 0) -> Array:
    """NHWC conv with an OIHW weight (stylegan's native weight layout).

    preferred_element_type is only passed for f32 operands: for bf16 the
    MXU accumulates in f32 regardless and we round to x.dtype right
    after, while conv's TRANSPOSE rule under preferred=f32 builds
    conv(f32 cotangent, bf16 kernel) — mixed dtypes, a TypeError."""
    kernel = jnp.transpose(w_oihw, (2, 3, 1, 0))  # -> HWIO
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet).astype(x.dtype)


def conv2d_resample(x: Array, w_oihw: Array, f, up: int = 1, down: int = 1,
                    padding: int = 0) -> Array:
    """FIR-resampled conv (capability parity with reference
    style_ops/conv2d_resample.py:45-142): zero-insert upsample + FIR and
    the conv commute, so we run upfirdn2d then a plain conv."""
    if up > 1:
        x = upsample2d(x, f, up=up)
    if down > 1:
        from studiogan_tpu.ops.upfirdn2d import filter2d
        x = filter2d(x, f)
        return _conv2d(x, w_oihw, stride=down, padding=padding)
    return _conv2d(x, w_oihw, stride=1, padding=padding)


def _grouped_modconv(x: Array, w_noikk: Array, f, up: int, down: int,
                     padding: int) -> Array:
    """Per-sample-weight conv as ONE grouped conv (the reference's
    fused_modconv=True path, stylegan2.py:84-94): batch folds into the
    channel axis with feature_group_count=N.  Resampling uses the same
    upfirdn decomposition as conv2d_resample, so both paths are
    numerically identical up to float association."""
    n, _, _, in_c = x.shape
    _, out_c, _, kh, kw = w_noikk.shape
    if up > 1:
        x = upsample2d(x, f, up=up)
    if down > 1:
        from studiogan_tpu.ops.upfirdn2d import filter2d
        x = filter2d(x, f)
    stride = down if down > 1 else 1
    xg = jnp.transpose(x, (1, 2, 0, 3)).reshape(
        1, x.shape[1], x.shape[2], n * in_c)
    kernel = jnp.transpose(w_noikk, (3, 4, 2, 0, 1)).reshape(
        kh, kw, in_c, n * out_c)
    y = jax.lax.conv_general_dilated(
        xg, kernel.astype(xg.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=n,
        preferred_element_type=(jnp.float32 if xg.dtype == jnp.float32
                                else None)).astype(x.dtype)
    y = y.reshape(y.shape[1], y.shape[2], n, out_c)
    return jnp.transpose(y, (2, 0, 1, 3))


def modulated_conv2d(x: Array, weight: Array, styles: Array,
                     noise: Array | None = None, up: int = 1, down: int = 1,
                     padding: int = 0, resample_filter=None,
                     demodulate: bool = True, fused: bool = False) -> Array:
    """reference stylegan2.py:28-98.  fused=False is the input-scale /
    output-demodulate formulation (reference fused_modconv=False) — the
    TPU default: dense batched convs keep the MXU full, while the fused
    grouped conv lowers to N independent small contractions.  fused=True
    folds styles and demod coefficients into per-sample weights and runs
    one grouped conv (reference fused_modconv=True, NVIDIA's eval path)."""
    out_c, in_c, kh, kw = weight.shape
    b = x.shape[0]

    if x.dtype == jnp.bfloat16 and demodulate:
        # pre-normalize to avoid low-precision overflow (reference :49-52)
        weight = weight * (1 / math.sqrt(in_c * kh * kw) /
                           jnp.max(jnp.abs(weight), axis=(1, 2, 3), keepdims=True))
        styles = styles / jnp.max(jnp.abs(styles), axis=1, keepdims=True)

    dcoefs = None
    if demodulate or fused:
        w = weight[None] * styles[:, None, :, None, None]           # [NOIkk]
        if demodulate:
            dcoefs = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(2, 3, 4)) + 1e-8)

    if fused:
        if demodulate:
            w = w * dcoefs[:, :, None, None, None]
        x = _grouped_modconv(x, w.astype(x.dtype), resample_filter, up, down,
                             padding)
        return x + noise.astype(x.dtype) if noise is not None else x

    x = x * styles[:, None, None, :].astype(x.dtype)
    x = conv2d_resample(x, weight, resample_filter, up=up, down=down,
                        padding=padding)
    if demodulate and noise is not None:
        x = x * dcoefs[:, None, None, :].astype(x.dtype) + noise.astype(x.dtype)
    elif demodulate:
        x = x * dcoefs[:, None, None, :].astype(x.dtype)
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x


class Conv2dLayer(nn.Module):
    """Equalized-lr conv with optional FIR resampling (reference
    stylegan2.py:134-188)."""
    features: int
    kernel_size: int
    use_bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: tuple = (1, 3, 3, 1)
    conv_clamp: float | None = None

    @nn.compact
    def __call__(self, x: Array, gain: float = 1.0) -> Array:
        in_c = x.shape[-1]
        k = self.kernel_size
        w = self.param("weight", nn.initializers.normal(1.0),
                       (self.features, in_c, k, k))
        w = w * (1 / math.sqrt(in_c * k * k))
        f = setup_filter(np.asarray(self.resample_filter, np.float32))
        x = conv2d_resample(x, w, f, up=self.up, down=self.down, padding=k // 2)
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, act=self.activation, gain=act_gain, clamp=act_clamp)


class MappingNetwork(nn.Module):
    """reference stylegan2.py:190-264.  w_avg is a ``stats_ema`` variable
    updated when ``update_emas`` and the collection is mutable."""
    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: int | None
    num_layers: int = 8
    embed_features: int | None = None
    layer_features: int | None = None
    activation: str = "lrelu"
    lr_multiplier: float = 0.01
    w_avg_beta: float | None = 0.998

    @nn.compact
    def __call__(self, z: Array | None, c: Array | None,
                 truncation_psi: float = 1.0, truncation_cutoff=None,
                 update_emas: bool = False) -> Array:
        embed_features = self.embed_features or self.w_dim
        if self.c_dim == 0:
            embed_features = 0
        layer_features = self.layer_features or self.w_dim

        x = None
        if self.z_dim > 0:
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            y = normalize_2nd_moment(
                FullyConnectedLayer(embed_features, name="embed")(
                    c.astype(jnp.float32)))
            x = jnp.concatenate([x, y], axis=1) if x is not None else y

        feats = [self.z_dim + embed_features] + \
            [layer_features] * (self.num_layers - 1) + [self.w_dim]
        for i in range(self.num_layers):
            x = FullyConnectedLayer(feats[i + 1], activation=self.activation,
                                    lr_multiplier=self.lr_multiplier,
                                    name=f"fc{i}")(x)

        if self.num_ws is not None and self.w_avg_beta is not None:
            w_avg = self.variable("stats_ema", "w_avg",
                                  lambda: jnp.zeros((self.w_dim,)))
            if update_emas and self.is_mutable_collection("stats_ema") \
                    and not self.is_initializing():
                mean_w = jax.lax.stop_gradient(jnp.mean(x, axis=0))
                w_avg.value = mean_w + self.w_avg_beta * (w_avg.value - mean_w)

        if self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)

        if truncation_psi != 1:
            assert self.w_avg_beta is not None
            avg = self.get_variable("stats_ema", "w_avg")
            trunc = avg + truncation_psi * (x - avg)
            if self.num_ws is None or truncation_cutoff is None:
                x = trunc
            else:
                mask = (jnp.arange(self.num_ws) < truncation_cutoff)[None, :, None]
                x = jnp.where(mask, trunc, x)
        return x


class SynthesisLayer(nn.Module):
    """reference stylegan2.py:265-324."""
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: tuple = (1, 3, 3, 1)
    conv_clamp: float | None = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, w: Array, noise_mode: str = "random",
                 gain: float = 1.0, fused_modconv: bool = False) -> Array:
        in_c = x.shape[-1]
        k = self.kernel_size
        styles = FullyConnectedLayer(in_c, bias_init=1.0, name="affine")(w)
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (self.out_channels, in_c, k, k))
        noise = None
        if self.use_noise:
            strength = self.param("noise_strength", nn.initializers.zeros, ())
            noise_const = self.variable(
                "buffers", "noise_const",
                lambda: jax.random.normal(self.make_rng("params"),
                                          (self.resolution, self.resolution)))
            if noise_mode == "random":
                noise = jax.random.normal(
                    self.make_rng("noise"),
                    (x.shape[0], self.resolution, self.resolution, 1)) * strength
            elif noise_mode == "const":
                noise = (noise_const.value * strength)[None, :, :, None]

        f = setup_filter(np.asarray(self.resample_filter, np.float32))
        x = modulated_conv2d(x.astype(self.compute_dtype), weight, styles,
                             noise=noise, up=self.up, padding=k // 2,
                             resample_filter=f, fused=fused_modconv)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, bias.astype(x.dtype), act=self.activation,
                        gain=act_gain, clamp=act_clamp)


class ToRGBLayer(nn.Module):
    """reference stylegan2.py:327-341."""
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: float | None = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, w: Array,
                 fused_modconv: bool = False) -> Array:
        in_c = x.shape[-1]
        k = self.kernel_size
        styles = FullyConnectedLayer(in_c, bias_init=1.0, name="affine")(w)
        styles = styles * (1 / math.sqrt(in_c * k * k))
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (self.out_channels, in_c, k, k))
        x = modulated_conv2d(x.astype(self.compute_dtype), weight, styles,
                             demodulate=False, padding=k // 2,
                             fused=fused_modconv)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return bias_act(x, bias.astype(x.dtype), clamp=self.conv_clamp)


class SynthesisBlock(nn.Module):
    """reference stylegan2.py:344-452 ('skip' G architecture)."""
    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    architecture: str = "skip"
    resample_filter: tuple = (1, 3, 3, 1)
    conv_clamp: float | None = None
    use_fp16: bool = False

    @nn.compact
    def __call__(self, x: Array | None, img: Array | None, ws: Array,
                 noise_mode: str = "random", force_fp32: bool = False,
                 fused_modconv: bool = False):
        dtype = jnp.bfloat16 if self.use_fp16 and not force_fp32 else jnp.float32
        w_idx = 0

        def next_w():
            nonlocal w_idx
            w = ws[:, w_idx]
            w_idx += 1
            return w

        layer = lambda out_c, up, name: SynthesisLayer(  # noqa: E731
            out_c, w_dim=self.w_dim, resolution=self.resolution, up=up,
            resample_filter=self.resample_filter, conv_clamp=self.conv_clamp,
            compute_dtype=dtype, name=name)
        lkw = dict(noise_mode=noise_mode, fused_modconv=fused_modconv)

        if self.in_channels == 0:
            const = self.param("const", nn.initializers.normal(1.0),
                               (self.resolution, self.resolution,
                                self.out_channels))
            x = jnp.broadcast_to(const[None], (ws.shape[0],) + const.shape)
            x = x.astype(dtype)
            x = layer(self.out_channels, 1, "conv1")(x, next_w(), **lkw)
        elif self.architecture == "resnet":
            y = Conv2dLayer(self.out_channels, 1, use_bias=False, up=2,
                            resample_filter=self.resample_filter,
                            name="skip")(x.astype(dtype), gain=math.sqrt(0.5))
            x = layer(self.out_channels, 2, "conv0")(x.astype(dtype), next_w(),
                                                     **lkw)
            x = layer(self.out_channels, 1, "conv1")(x, next_w(),
                                                     gain=math.sqrt(0.5), **lkw)
            x = y + x
        else:
            x = layer(self.out_channels, 2, "conv0")(x.astype(dtype), next_w(),
                                                     **lkw)
            x = layer(self.out_channels, 1, "conv1")(x, next_w(), **lkw)

        if img is not None:
            f = setup_filter(np.asarray(self.resample_filter, np.float32))
            img = upsample2d(img, f)
        if self.is_last or self.architecture == "skip":
            y = ToRGBLayer(self.img_channels, w_dim=self.w_dim,
                           conv_clamp=self.conv_clamp, compute_dtype=dtype,
                           name="torgb")(x, next_w(),
                                         fused_modconv=fused_modconv)
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
        return x, img


def _block_channels(img_resolution: int, channel_base: int, channel_max: int):
    log2 = int(math.log2(img_resolution))
    resolutions = [2 ** i for i in range(2, log2 + 1)]
    channels = {res: min(channel_base // res, channel_max)
                for res in resolutions}
    return resolutions, channels


def num_synthesis_ws(img_resolution: int) -> int:
    resolutions, _ = _block_channels(img_resolution, 32768, 512)
    n = 0
    for res in resolutions:
        n += 1 if res == 4 else 2
    return n + 1  # + last torgb (reference SynthesisNetwork:491-493)


class SynthesisNetwork(nn.Module):
    """reference stylegan2.py:455-510."""
    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0
    conv_clamp: float | None = None
    architecture: str = "skip"

    @nn.compact
    def __call__(self, ws: Array, noise_mode: str = "random",
                 force_fp32: bool = False,
                 fused_modconv: bool = False) -> Array:
        resolutions, channels = _block_channels(
            self.img_resolution, self.channel_base, self.channel_max)
        log2 = int(math.log2(self.img_resolution))
        fp16_resolution = max(2 ** (log2 + 1 - self.num_fp16_res), 8)

        ws = ws.astype(jnp.float32)
        x = img = None
        w_idx = 0
        for res in resolutions:
            in_c = channels[res // 2] if res > 4 else 0
            num_conv = 1 if res == 4 else 2
            num_torgb = 1  # skip architecture: every block
            block_ws = jax.lax.dynamic_slice_in_dim(
                ws, w_idx, num_conv + num_torgb, axis=1)
            x, img = SynthesisBlock(
                in_channels=in_c, out_channels=channels[res], w_dim=self.w_dim,
                resolution=res, img_channels=self.img_channels,
                is_last=res == self.img_resolution,
                architecture=self.architecture,
                conv_clamp=self.conv_clamp,
                use_fp16=self.num_fp16_res > 0 and res >= fp16_resolution,
                name=f"b{res}")(x, img, block_ws, noise_mode=noise_mode,
                                force_fp32=force_fp32,
                                fused_modconv=fused_modconv)
            w_idx += num_conv
        return img


class Generator(nn.Module):
    """reference stylegan2.py:512-548 + sample.stylegan_generate_images
    (style mixing lives here so the engine stays backbone-agnostic)."""
    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    num_classes: int
    mapping_layers: int = 8
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0
    conv_clamp: float | None = None
    info_extra_dim: int = 0

    def setup(self):
        resolutions, _ = _block_channels(self.img_resolution, self.channel_base,
                                         self.channel_max)
        self.num_ws = sum(1 if r == 4 else 2 for r in resolutions) + 1
        self.synthesis = SynthesisNetwork(
            w_dim=self.w_dim, img_resolution=self.img_resolution,
            img_channels=self.img_channels, channel_base=self.channel_base,
            channel_max=self.channel_max, num_fp16_res=self.num_fp16_res,
            conv_clamp=self.conv_clamp)
        self.mapping = MappingNetwork(
            z_dim=self.z_dim + self.info_extra_dim, c_dim=self.c_dim,
            w_dim=self.w_dim, num_ws=self.num_ws,
            num_layers=self.mapping_layers)

    def __call__(self, z: Array, label: Array | None,
                 shared_label: Array | None = None, train: bool = True,
                 truncation_psi: float = 1.0, truncation_cutoff=None,
                 style_mixing_p: float = 0.0, update_emas: bool = False,
                 noise_mode: str = "random",
                 fused_modconv: bool = False) -> Array:
        c = (jax.nn.one_hot(label, self.num_classes)
             if self.c_dim > 0 else None)
        ws = self.mapping(z, c, truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff,
                          update_emas=update_emas)
        if style_mixing_p > 0:
            k1, k2, k3 = jax.random.split(self.make_rng("style_mix"), 3)
            cutoff = jax.random.randint(k1, (), 1, self.num_ws)
            cutoff = jnp.where(jax.random.uniform(k2) < style_mixing_p,
                               cutoff, self.num_ws)
            ws2 = self.mapping(jax.random.normal(k3, z.shape), c,
                               update_emas=False)
            mask = (jnp.arange(self.num_ws) >= cutoff)[None, :, None]
            ws = jnp.where(mask, ws2, ws)
        return self.synthesis(
            ws, noise_mode=noise_mode if train else "const",
            fused_modconv=fused_modconv)

    def run_mapping(self, z, label, truncation_psi=1.0, truncation_cutoff=None,
                    update_emas=False):
        c = jax.nn.one_hot(label, self.num_classes) if self.c_dim > 0 else None
        return self.mapping(z, c, truncation_psi=truncation_psi,
                            truncation_cutoff=truncation_cutoff,
                            update_emas=update_emas)

    def run_synthesis(self, ws, noise_mode="random", fused_modconv=False):
        return self.synthesis(ws, noise_mode=noise_mode,
                              fused_modconv=fused_modconv)


# ---------------------------------------------------------------------------
# Discriminator (StyleGAN2 D, reused by StyleGAN3; reference model.py:65)
# ---------------------------------------------------------------------------


class MinibatchStdLayer(nn.Module):
    """reference stylegan2.py:659-680."""
    group_size: int | None
    num_channels: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        g = min(self.group_size, n) if self.group_size is not None else n
        f = self.num_channels
        cc = c // f
        y = x.reshape(g, n // g, h, w, f, cc)
        y = y - jnp.mean(y, axis=0, keepdims=True)
        y = jnp.sqrt(jnp.mean(jnp.square(y), axis=0) + 1e-8)  # (n/g,h,w,f,cc)
        y = jnp.mean(y, axis=(1, 2, 4))                        # (n/g, f)
        # torch's y.repeat(G,1,H,W) tiles: sample j gets the std of its own
        # strided group j % (n/g) (reference stylegan2.py:676)
        y = jnp.tile(y, (g, 1))                                # (n, f)
        y = jnp.broadcast_to(y[:, None, None, :], (n, h, w, f))
        return jnp.concatenate([x, y.astype(x.dtype)], axis=-1)


class DiscriminatorBlock(nn.Module):
    """reference stylegan2.py:551-656."""
    in_channels: int
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    activation: str = "lrelu"
    resample_filter: tuple = (1, 3, 3, 1)
    conv_clamp: float | None = None
    use_fp16: bool = False

    @nn.compact
    def __call__(self, x: Array | None, img: Array | None,
                 force_fp32: bool = False):
        dtype = jnp.bfloat16 if self.use_fp16 and not force_fp32 else jnp.float32
        if x is not None:
            x = x.astype(dtype)
        if self.in_channels == 0 or self.architecture == "skip":
            img = img.astype(dtype)
            y = Conv2dLayer(self.tmp_channels, 1, activation=self.activation,
                            conv_clamp=self.conv_clamp, name="fromrgb")(img)
            x = x + y if x is not None else y
            if self.architecture == "skip":
                f = setup_filter(np.asarray(self.resample_filter, np.float32))
                img = downsample2d(img, f)
            else:
                img = None
        if self.architecture == "resnet":
            y = Conv2dLayer(self.out_channels, 1, use_bias=False, down=2,
                            resample_filter=self.resample_filter,
                            name="skip")(x, gain=math.sqrt(0.5))
            x = Conv2dLayer(self.tmp_channels, 3, activation=self.activation,
                            conv_clamp=self.conv_clamp, name="conv0")(x)
            x = Conv2dLayer(self.out_channels, 3, activation=self.activation,
                            down=2, resample_filter=self.resample_filter,
                            conv_clamp=self.conv_clamp,
                            name="conv1")(x, gain=math.sqrt(0.5))
            x = y + x
        else:
            x = Conv2dLayer(self.tmp_channels, 3, activation=self.activation,
                            conv_clamp=self.conv_clamp, name="conv0")(x)
            x = Conv2dLayer(self.out_channels, 3, activation=self.activation,
                            down=2, resample_filter=self.resample_filter,
                            conv_clamp=self.conv_clamp, name="conv1")(x)
        return x, img


class DiscriminatorEpilogue(nn.Module):
    """reference stylegan2.py:683-731 (the ``out`` layer moved into the
    conditioning head below, matching StudioGAN's commented-out line)."""
    in_channels: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    mbstd_group_size: int | None = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"
    conv_clamp: float | None = None

    @nn.compact
    def __call__(self, x: Array, img: Array | None) -> Array:
        x = x.astype(jnp.float32)
        if self.architecture == "skip":
            x = x + Conv2dLayer(self.in_channels, 1, activation=self.activation,
                                name="fromrgb")(img.astype(jnp.float32))
        if self.mbstd_num_channels > 0:
            x = MinibatchStdLayer(self.mbstd_group_size,
                                  self.mbstd_num_channels, name="mbstd")(x)
        x = Conv2dLayer(self.in_channels, 3, activation=self.activation,
                        conv_clamp=self.conv_clamp, name="conv")(x)
        x = FullyConnectedLayer(self.in_channels, activation=self.activation,
                                name="fc")(x.reshape(x.shape[0], -1))
        return x


class Discriminator(nn.Module):
    """reference stylegan2.py:734-923 with all StudioGAN conditioning."""
    c_dim: int
    img_resolution: int
    img_channels: int
    architecture: str = "resnet"
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0
    conv_clamp: float | None = None
    cmap_dim: int | None = None
    d_cond_mtd: str = "W/O"
    aux_cls_type: str = "W/O"
    d_embed_dim: Any = NA
    num_classes: int = 1
    normalize_d_embed: bool = False
    mbstd_group_size: Any = 4
    info_type: str = NA
    info_num_discrete_c: Any = NA
    info_dim_discrete_c: Any = NA
    info_num_conti_c: Any = NA

    @nn.compact
    def __call__(self, img: Array, label: Array | None, train: bool = True,
                 adc_fake: bool = False, force_fp32: bool = False) -> dict:
        log2 = int(math.log2(self.img_resolution))
        resolutions = [2 ** i for i in range(log2, 2, -1)]
        channels = {res: min(self.channel_base // res, self.channel_max)
                    for res in resolutions + [4]}
        fp16_resolution = max(2 ** (log2 + 1 - self.num_fp16_res), 8)
        cmap_dim = self.cmap_dim if self.cmap_dim is not None else channels[4]
        if self.c_dim == 0:
            cmap_dim = 0

        x = None
        for res in resolutions:
            x, img = DiscriminatorBlock(
                in_channels=channels[res] if res < self.img_resolution else 0,
                tmp_channels=channels[res], out_channels=channels[res // 2],
                resolution=res, img_channels=self.img_channels,
                architecture=self.architecture, conv_clamp=self.conv_clamp,
                use_fp16=self.num_fp16_res > 0 and res >= fp16_resolution,
                name=f"b{res}")(x, img, force_fp32=force_fp32)
        h = DiscriminatorEpilogue(
            channels[4], resolution=4, img_channels=self.img_channels,
            architecture=self.architecture,
            mbstd_group_size=None if self.mbstd_group_size in (NA, None)
            else self.mbstd_group_size,
            conv_clamp=self.conv_clamp, name="b4")(x, img)

        out = dict(h=h, embed=None, proxy=None, cls_output=None, label=label,
                   mi_embed=None, mi_proxy=None, mi_cls_output=None,
                   info_discrete_c_logits=None, info_conti_mu=None,
                   info_conti_var=None)
        fc = lambda f, b, name: FullyConnectedLayer(  # noqa: E731
            f, use_bias=b, name=name)

        # adversarial head (reference :796-805)
        if self.d_cond_mtd == "MH":
            adv = fc(1 + self.num_classes, True, "linear1")(h)
        elif self.d_cond_mtd == "MD":
            adv = fc(self.num_classes, True, "linear1")(h)
        elif self.d_cond_mtd == "SPD":
            adv = None
        else:
            adv = jnp.squeeze(fc(1, True, "linear1")(h), axis=-1)

        num_classes, c_dim = self.num_classes, self.c_dim
        if self.aux_cls_type == "ADC":
            num_classes, c_dim = num_classes * 2, c_dim * 2
            label = label * 2 + (1 if adc_fake else 0)
            out["label"] = label
        oh_label = jax.nn.one_hot(label, num_classes) if label is not None else None

        if self.info_type in ("discrete", "both"):
            q = self.info_num_discrete_c * self.info_dim_discrete_c
            out["info_discrete_c_logits"] = fc(q, False, "info_discrete_linear")(h)
        if self.info_type in ("continuous", "both"):
            q = self.info_num_conti_c
            out["info_conti_mu"] = fc(q, False, "info_conti_mu_linear")(h)
            out["info_conti_var"] = jnp.exp(fc(q, False, "info_conti_var_linear")(h))

        def l2n(t):
            return t / (jnp.linalg.norm(t, axis=1, keepdims=True) + 1e-12)

        cond_mapping = lambda wd, nl, name: MappingNetwork(  # noqa: E731
            z_dim=0, c_dim=c_dim, w_dim=wd, num_ws=None, w_avg_beta=None,
            num_layers=nl, name=name)

        if self.d_cond_mtd == "AC":
            hh = l2n(h) if self.normalize_d_embed else h
            out["cls_output"] = fc(num_classes, False, "linear2")(hh)
        elif self.d_cond_mtd == "PD":
            # The reference's stylegan2+PD forward references an undefined
            # self.embedding (stylegan2.py:872 vs :813) — unreachable in
            # shipped configs (they use SPD). We implement the evident
            # intent: project the one-hot label into h-space and dot.
            proxy = fc(h.shape[-1], True, "embedding")(oh_label)
            adv = adv + jnp.sum(proxy * h, axis=1)
        elif self.d_cond_mtd == "SPD":
            embed = fc(1 if cmap_dim == 0 else cmap_dim, True, "linear1")(h)
            cmap = cond_mapping(cmap_dim, 8, "mapping")(None, oh_label)
            adv = jnp.sum(embed * cmap, axis=1) / math.sqrt(cmap_dim)
            out["embed"] = embed
        elif self.d_cond_mtd in ("2C", "D2DCE"):
            embed = fc(self.d_embed_dim, True, "linear2")(h)
            proxy = cond_mapping(self.d_embed_dim, 1, "embedding")(None, oh_label)
            if self.normalize_d_embed:
                embed, proxy = l2n(embed), l2n(proxy)
            out["embed"], out["proxy"] = embed, proxy
        elif self.d_cond_mtd == "MD":
            adv = jnp.take_along_axis(adv, label[:, None], axis=1)[:, 0]
        elif self.d_cond_mtd in ("W/O", "MH"):
            pass
        else:
            raise NotImplementedError(self.d_cond_mtd)

        if self.aux_cls_type == "TAC":
            if self.d_cond_mtd == "AC":
                hh = l2n(h) if self.normalize_d_embed else h
                out["mi_cls_output"] = fc(num_classes, False, "linear_mi")(hh)
            elif self.d_cond_mtd in ("2C", "D2DCE"):
                mi_embed = fc(self.d_embed_dim, True, "linear_mi")(h)
                mi_proxy = cond_mapping(self.d_embed_dim, 1,
                                        "embedding_mi")(None, oh_label)
                if self.normalize_d_embed:
                    mi_embed, mi_proxy = l2n(mi_embed), l2n(mi_proxy)
                out["mi_embed"], out["mi_proxy"] = mi_embed, mi_proxy
            else:
                raise NotImplementedError

        out["adv_output"] = adv
        return out


# ---------------------------------------------------------------------------
# config-driven factories (reference model.py:26-85)
# ---------------------------------------------------------------------------

def _stylegan_channel_policy(cfg):
    backbone = cfg.MODEL.backbone
    channel_base = 32768 if (backbone == "stylegan3" or cfg.DATA.img_size >= 512
                             or cfg.DATA.name in ("CIFAR10", "CIFAR100")) else 16384
    channel_max = 512
    num_fp16_res = 4 if cfg.RUN.mixed_precision else 0
    conv_clamp = 256 if cfg.RUN.mixed_precision else None
    return channel_base, channel_max, num_fp16_res, conv_clamp


def make_generator(cfg) -> Generator:
    channel_base, channel_max, num_fp16_res, conv_clamp = _stylegan_channel_policy(cfg)
    M = cfg.MODEL
    info_extra = 0
    if M.info_type in ("discrete", "both"):
        info_extra += M.info_num_discrete_c * M.info_dim_discrete_c
    if M.info_type in ("continuous", "both"):
        info_extra += M.info_num_conti_c
    return Generator(
        z_dim=M.z_dim,
        c_dim=cfg.DATA.num_classes if M.g_cond_mtd == "cAdaIN" else 0,
        w_dim=M.w_dim, img_resolution=cfg.DATA.img_size,
        img_channels=cfg.DATA.img_channels,
        num_classes=cfg.DATA.num_classes,
        mapping_layers=cfg.STYLEGAN.mapping_network,
        channel_base=channel_base, channel_max=channel_max,
        num_fp16_res=num_fp16_res, conv_clamp=conv_clamp,
        info_extra_dim=info_extra)


def make_discriminator(cfg) -> Discriminator:
    channel_base, channel_max, num_fp16_res, conv_clamp = _stylegan_channel_policy(cfg)
    M = cfg.MODEL
    return Discriminator(
        c_dim=cfg.DATA.num_classes if M.d_cond_mtd in tuple(cfg.STYLEGAN.cond_type) else 0,
        img_resolution=cfg.DATA.img_size, img_channels=cfg.DATA.img_channels,
        architecture=cfg.STYLEGAN.d_architecture if cfg.STYLEGAN.d_architecture != NA else "resnet",
        channel_base=channel_base, channel_max=channel_max,
        num_fp16_res=num_fp16_res, conv_clamp=conv_clamp,
        d_cond_mtd=M.d_cond_mtd, aux_cls_type=M.aux_cls_type,
        d_embed_dim=M.d_embed_dim, num_classes=cfg.DATA.num_classes,
        normalize_d_embed=M.normalize_d_embed,
        mbstd_group_size=cfg.STYLEGAN.d_epilogue_mbstd_group_size,
        info_type=M.info_type,
        info_num_discrete_c=M.info_num_discrete_c,
        info_dim_discrete_c=M.info_dim_discrete_c,
        info_num_conti_c=M.info_num_conti_c)
