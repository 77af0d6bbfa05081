"""StyleGAN3 (alias-free) generator in Flax, NHWC (capability parity with
reference src/models/stylegan3.py; the discriminator is StyleGAN2's,
reference model.py:65).

The whole layer plan — cutoffs, sampling rates, sizes, channels, Kaiser/
jinc filters, paddings — is static numpy computed at setup (reference
stylegan3.py:400-456), so the traced computation is pure static-shape
convs + the filtered_lrelu composition (studiogan_tpu/ops/filtered_lrelu).
The per-layer input magnitude EMA lives in ``stats_ema``.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from studiogan_tpu.models.stylegan2 import (
    FullyConnectedLayer, MappingNetwork, _conv2d,
)
from studiogan_tpu.ops.filtered_lrelu import filtered_lrelu

Array = jax.Array
NA = "N/A"


def design_lowpass_filter(numtaps: int, cutoff: float, width: float, fs: float,
                          radial: bool = False):
    """reference stylegan3.py:350-371."""
    import scipy.signal
    assert numtaps >= 1
    if numtaps == 1:
        return None
    if not radial:
        return scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff,
                                   width=width, fs=fs).astype(np.float32)
    x = (np.arange(numtaps) - (numtaps - 1) / 2) / fs
    r = np.hypot(*np.meshgrid(x, x))
    import scipy.special
    with np.errstate(divide="ignore", invalid="ignore"):
        f = scipy.special.j1(2 * cutoff * (np.pi * r)) / (np.pi * r)
    f[r == 0] = cutoff * cutoff  # limit of j1(2c pi r)/(pi r) scaled; fixed below by normalization
    beta = scipy.signal.kaiser_beta(
        scipy.signal.kaiser_atten(numtaps, width / (fs / 2)))
    w = np.kaiser(numtaps, beta)
    f = f * np.outer(w, w)
    f = f / np.sum(f)
    return f.astype(np.float32)


def sg3_modulated_conv2d(x: Array, weight: Array, styles: Array,
                         demodulate: bool = True, padding: int = 0,
                         input_gain: Array | None = None) -> Array:
    """reference stylegan3.py:24-64, input-scale formulation (NHWC)."""
    out_c, in_c, kh, kw = weight.shape
    if demodulate:
        weight = weight * jax.lax.rsqrt(
            jnp.mean(jnp.square(weight), axis=(1, 2, 3), keepdims=True))
        styles = styles * jax.lax.rsqrt(jnp.mean(jnp.square(styles)))
    dcoefs = None
    if demodulate:
        w = weight[None] * styles[:, None, :, None, None]
        dcoefs = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(2, 3, 4)) + 1e-8)
    if input_gain is not None:
        x = x * input_gain.astype(x.dtype)  # scalar: commutes with the conv
    x = x * styles[:, None, None, :].astype(x.dtype)
    x = _conv2d(x, weight, stride=1, padding=padding)
    if demodulate:
        x = x * dcoefs[:, None, None, :].astype(x.dtype)
    return x


class SynthesisInput(nn.Module):
    """Fourier-feature input with learned affine transform
    (reference stylegan3.py:165-243)."""
    w_dim: int
    channels: int
    size: int
    sampling_rate: float
    bandwidth: float

    @nn.compact
    def __call__(self, w: Array) -> Array:
        def init_freqs():
            k = self.make_rng("params")
            f = jax.random.normal(k, (self.channels, 2))
            radii = jnp.sqrt(jnp.sum(jnp.square(f), axis=1, keepdims=True))
            f = f / (radii * jnp.exp(jnp.square(radii)) ** 0.25)
            return f * self.bandwidth

        freqs = self.variable("buffers", "freqs", init_freqs).value
        phases = self.variable(
            "buffers", "phases",
            lambda: jax.random.uniform(self.make_rng("params"),
                                       (self.channels,)) - 0.5).value
        transform = self.variable("buffers", "transform",
                                  lambda: jnp.eye(3)).value

        b = w.shape[0]
        t = FullyConnectedLayer(4, weight_init=0.0,
                                bias_init=(1, 0, 0, 0), name="affine")(w)
        t = t / jnp.linalg.norm(t[:, :2], axis=1, keepdims=True)
        # inverse rotation + translation matrices (reference :203-213)
        zeros = jnp.zeros((b,))
        ones = jnp.ones((b,))
        m_r = jnp.stack([
            jnp.stack([t[:, 0], -t[:, 1], zeros], axis=1),
            jnp.stack([t[:, 1], t[:, 0], zeros], axis=1),
            jnp.stack([zeros, zeros, ones], axis=1)], axis=1)
        m_t = jnp.stack([
            jnp.stack([ones, zeros, -t[:, 2]], axis=1),
            jnp.stack([zeros, ones, -t[:, 3]], axis=1),
            jnp.stack([zeros, zeros, ones], axis=1)], axis=1)
        transforms = m_r @ m_t @ transform[None]

        fr = freqs[None]                                       # (1,C,2)
        ph = phases[None] + jnp.squeeze(fr @ transforms[:, :2, 2:], -1)
        fr = fr @ transforms[:, :2, :2]                        # (B,C,2)

        amplitudes = jnp.clip(
            1 - (jnp.linalg.norm(fr, axis=2) - self.bandwidth)
            / (self.sampling_rate / 2 - self.bandwidth), 0, 1)

        # sampling grid (torch affine_grid, align_corners=False)
        s = self.size
        scale = 0.5 * s / self.sampling_rate
        coords = ((2 * jnp.arange(s) + 1) / s - 1) * scale     # (s,)
        gx = jnp.broadcast_to(coords[None, :], (s, s))
        gy = jnp.broadcast_to(coords[:, None], (s, s))
        grid = jnp.stack([gx, gy], axis=-1)                    # (s,s,2)

        x = jnp.einsum("hwd,bcd->bhwc", grid, fr) + ph[:, None, None, :]
        x = jnp.sin(x * (2 * math.pi)) * amplitudes[:, None, None, :]

        weight = self.param("weight", nn.initializers.normal(1.0),
                            (self.channels, self.channels))
        return x @ (weight / math.sqrt(self.channels)).T


class SG3SynthesisLayer(nn.Module):
    """reference stylegan3.py:248-347."""
    w_dim: int
    is_torgb: bool
    is_critically_sampled: bool
    in_channels: int
    out_channels: int
    in_size: int
    out_size: int
    in_sampling_rate: int
    out_sampling_rate: int
    in_cutoff: float
    out_cutoff: float
    in_half_width: float
    out_half_width: float
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    use_radial_filters: bool = False
    conv_clamp: float | None = 256
    magnitude_ema_beta: float = 0.999
    flrelu_impl: str = "ref"   # "ref" | "pallas" (fused kernel; wins at
                               # mid-res/512ch — ops/pallas, measured
                               # envelope in scripts/profile_filtered_lrelu)

    def setup(self):
        self.kernel = 1 if self.is_torgb else self.conv_kernel
        tmp_rate = max(self.in_sampling_rate, self.out_sampling_rate) * \
            (1 if self.is_torgb else self.lrelu_upsampling)
        self.up_factor = int(round(tmp_rate / self.in_sampling_rate))
        self.down_factor = int(round(tmp_rate / self.out_sampling_rate))
        up_taps = self.filter_size * self.up_factor \
            if self.up_factor > 1 and not self.is_torgb else 1
        down_taps = self.filter_size * self.down_factor \
            if self.down_factor > 1 and not self.is_torgb else 1
        down_radial = self.use_radial_filters and not self.is_critically_sampled
        self.up_filter = design_lowpass_filter(
            up_taps, self.in_cutoff, self.in_half_width * 2, tmp_rate)
        self.down_filter = design_lowpass_filter(
            down_taps, self.out_cutoff, self.out_half_width * 2, tmp_rate,
            radial=down_radial)
        pad_total = (self.out_size - 1) * self.down_factor + 1
        pad_total -= (self.in_size + self.kernel - 1) * self.up_factor
        pad_total += up_taps + down_taps - 2
        pad_lo = (pad_total + self.up_factor) // 2
        pad_hi = pad_total - pad_lo
        self.pad = (int(pad_lo), int(pad_hi), int(pad_lo), int(pad_hi))

        self.affine = FullyConnectedLayer(self.in_channels, bias_init=1.0,
                                          name="affine_fc")
        self.weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (self.out_channels, self.in_channels, self.kernel, self.kernel))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.out_channels,))
        self.magnitude_ema = self.variable("stats_ema", "magnitude_ema",
                                           lambda: jnp.ones(()))

    def __call__(self, x: Array, w: Array, update_emas: bool = False) -> Array:
        if update_emas and self.is_mutable_collection("stats_ema") \
                and not self.is_initializing():
            cur = jax.lax.stop_gradient(
                jnp.mean(jnp.square(x.astype(jnp.float32))))
            self.magnitude_ema.value = cur + self.magnitude_ema_beta * (
                self.magnitude_ema.value - cur)
        input_gain = jax.lax.rsqrt(self.magnitude_ema.value)

        styles = self.affine(w)
        if self.is_torgb:
            styles = styles * (1 / math.sqrt(self.in_channels * self.kernel ** 2))

        x = sg3_modulated_conv2d(x, self.weight, styles,
                                 demodulate=not self.is_torgb,
                                 padding=self.kernel - 1,
                                 input_gain=input_gain)

        gain = 1.0 if self.is_torgb else math.sqrt(2)
        slope = 1.0 if self.is_torgb else 0.2
        x = filtered_lrelu(x, fu=self.up_filter, fd=self.down_filter,
                           b=self.bias.astype(x.dtype), up=self.up_factor,
                           down=self.down_factor, padding=self.pad, gain=gain,
                           slope=slope, clamp=self.conv_clamp,
                           impl=self.flrelu_impl)
        return x


class SynthesisNetwork(nn.Module):
    """reference stylegan3.py:393-478."""
    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_layers: int = 14
    num_critical: int = 2
    first_cutoff: float = 2.0
    first_stopband: float = 2 ** 2.1
    last_stopband_rel: float = 2 ** 0.3
    margin_size: int = 10
    output_scale: float = 0.25
    conv_kernel: int = 3
    use_radial_filters: bool = False
    conv_clamp: float | None = 256
    magnitude_ema_beta: float = 0.999
    flrelu_impl: str = "ref"

    def setup(self):
        last_cutoff = self.img_resolution / 2
        last_stopband = last_cutoff * self.last_stopband_rel
        exponents = np.minimum(
            np.arange(self.num_layers + 1) / (self.num_layers - self.num_critical), 1)
        cutoffs = self.first_cutoff * (last_cutoff / self.first_cutoff) ** exponents
        stopbands = self.first_stopband * (last_stopband / self.first_stopband) ** exponents
        sampling_rates = np.exp2(np.ceil(np.log2(
            np.minimum(stopbands * 2, self.img_resolution))))
        half_widths = np.maximum(stopbands, sampling_rates / 2) - cutoffs
        sizes = sampling_rates + self.margin_size * 2
        sizes[-2:] = self.img_resolution
        channels = np.rint(np.minimum((self.channel_base / 2) / cutoffs,
                                      self.channel_max))
        channels[-1] = self.img_channels

        self.input = SynthesisInput(
            w_dim=self.w_dim, channels=int(channels[0]), size=int(sizes[0]),
            sampling_rate=float(sampling_rates[0]), bandwidth=float(cutoffs[0]))
        layers = []
        for idx in range(self.num_layers + 1):
            prev = max(idx - 1, 0)
            layers.append(SG3SynthesisLayer(
                w_dim=self.w_dim,
                is_torgb=idx == self.num_layers,
                is_critically_sampled=idx >= self.num_layers - self.num_critical,
                in_channels=int(channels[prev]), out_channels=int(channels[idx]),
                in_size=int(sizes[prev]), out_size=int(sizes[idx]),
                in_sampling_rate=int(sampling_rates[prev]),
                out_sampling_rate=int(sampling_rates[idx]),
                in_cutoff=float(cutoffs[prev]), out_cutoff=float(cutoffs[idx]),
                in_half_width=float(half_widths[prev]),
                out_half_width=float(half_widths[idx]),
                conv_kernel=self.conv_kernel,
                use_radial_filters=self.use_radial_filters,
                conv_clamp=self.conv_clamp,
                magnitude_ema_beta=self.magnitude_ema_beta,
                flrelu_impl=self.flrelu_impl,
                name=f"L{idx}"))
        self.layers = layers

    def __call__(self, ws: Array, update_emas: bool = False,
                 noise_mode: str = "none") -> Array:
        ws = ws.astype(jnp.float32)
        x = self.input(ws[:, 0])
        for i, layer in enumerate(self.layers):
            x = layer(x, ws[:, i + 1], update_emas=update_emas)
        if self.output_scale != 1:
            x = x * self.output_scale
        return x.astype(jnp.float32)


class Generator(nn.Module):
    """reference stylegan3.py:483-520."""
    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    num_classes: int
    mapping_layers: int = 2
    channel_base: int = 32768
    channel_max: int = 512
    conv_kernel: int = 3
    use_radial_filters: bool = False
    conv_clamp: float | None = 256
    magnitude_ema_beta: float = 0.999
    info_extra_dim: int = 0
    flrelu_impl: str = "ref"

    def setup(self):
        self.synthesis = SynthesisNetwork(
            w_dim=self.w_dim, img_resolution=self.img_resolution,
            img_channels=self.img_channels, channel_base=self.channel_base,
            channel_max=self.channel_max, conv_kernel=self.conv_kernel,
            use_radial_filters=self.use_radial_filters,
            conv_clamp=self.conv_clamp,
            magnitude_ema_beta=self.magnitude_ema_beta,
            flrelu_impl=self.flrelu_impl)
        self.num_ws = self.synthesis.num_layers + 2
        self.mapping = MappingNetwork(
            z_dim=self.z_dim + self.info_extra_dim, c_dim=self.c_dim,
            w_dim=self.w_dim, num_ws=self.num_ws,
            num_layers=self.mapping_layers)

    def __call__(self, z: Array, label: Array | None,
                 shared_label: Array | None = None, train: bool = True,
                 truncation_psi: float = 1.0, truncation_cutoff=None,
                 style_mixing_p: float = 0.0, update_emas: bool = False,
                 noise_mode: str = "none") -> Array:
        c = jax.nn.one_hot(label, self.num_classes) if self.c_dim > 0 else None
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
        return self.synthesis(ws, update_emas=update_emas)

    def run_mapping(self, z, label, truncation_psi=1.0, truncation_cutoff=None,
                    update_emas=False):
        c = jax.nn.one_hot(label, self.num_classes) if self.c_dim > 0 else None
        return self.mapping(z, c, truncation_psi=truncation_psi,
                            truncation_cutoff=truncation_cutoff,
                            update_emas=update_emas)

    def run_synthesis(self, ws, noise_mode="none"):
        return self.synthesis(ws)


def make_generator(cfg) -> Generator:
    """reference model.py:26-61 stylegan3 policy."""
    from studiogan_tpu.models.stylegan2 import _stylegan_channel_policy
    channel_base, channel_max, num_fp16_res, conv_clamp = _stylegan_channel_policy(cfg)
    M, O, SG = cfg.MODEL, cfg.OPTIMIZATION, cfg.STYLEGAN
    magnitude_ema_beta = 0.5 ** (O.batch_size * O.acml_steps / (20 * 1e3))
    g_channel_base, g_channel_max = channel_base, channel_max
    conv_kernel, use_radial = 3, False
    if SG.stylegan3_cfg == "stylegan3-r":
        g_channel_base, g_channel_max = channel_base * 2, channel_max * 2
        conv_kernel, use_radial = 1, True
    info_extra = 0
    if M.info_type in ("discrete", "both"):
        info_extra += M.info_num_discrete_c * M.info_dim_discrete_c
    if M.info_type in ("continuous", "both"):
        info_extra += M.info_num_conti_c
    return Generator(
        z_dim=M.z_dim,
        c_dim=cfg.DATA.num_classes if M.g_cond_mtd == "cAdaIN" else 0,
        w_dim=M.w_dim, img_resolution=cfg.DATA.img_size,
        img_channels=cfg.DATA.img_channels, num_classes=cfg.DATA.num_classes,
        mapping_layers=SG.mapping_network,
        channel_base=g_channel_base, channel_max=g_channel_max,
        conv_kernel=conv_kernel, use_radial_filters=use_radial,
        conv_clamp=256 if conv_clamp else None,
        magnitude_ema_beta=magnitude_ema_beta, info_extra_dim=info_extra,
        flrelu_impl=getattr(cfg.STYLEGAN, "filtered_lrelu_impl", "ref"))
