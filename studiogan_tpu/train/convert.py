"""Reference-checkpoint interop: convert PyTorch-StudioGAN .pth GAN
checkpoints (reference worker.save format, worker.py:940-983 /
utils/ckpt.py:77-134) into this framework's parameter trees.

Scope: the resnet-family backbones (big_resnet, resnet, deep_conv —
identical naming schemes in the reference).  Torch module names are
re-derived from the config exactly as the reference constructs them
(blocks list-of-lists with attention entries interleaved,
big_resnet.py:104-117), so a user can bring their trained StudioGAN
models across.  Optimizer state is not converted (reinitialized), as in
the reference's weights-only load path (ckpt.py:88-103).

Conventions:
  torch Linear weight (out, in)      -> Dense kernel (in, out)      [.T]
  torch Conv2d weight (O, I, kh, kw) -> Conv kernel HWIO             [2,3,1,0]
  torch spectral_norm: weight_orig + weight_u/weight_v buffers
                                     -> params kernel + sn u/v
  torch BN running_mean/var/num_batches_tracked
                                     -> batch_stats mean/var/n
"""

from __future__ import annotations

import numpy as np

NA = "N/A"


def _put(tree: dict, path: tuple, v):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(v)


class _Mapper:
    def __init__(self, sd: dict):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.params: dict = {}
        self.stats: dict = {}
        self.sn: dict = {}
        self.missing: list[str] = []

    def _get(self, name: str):
        if name in self.sd:
            return self.sd[name]
        self.missing.append(name)
        return None

    def _weight(self, src: str, dst: tuple):
        """Fetch .weight or the SN pair (.weight_orig + u/v buffers)."""
        if src + ".weight" in self.sd:
            return self.sd[src + ".weight"]
        if src + ".weight_orig" in self.sd:
            _put(self.sn, dst + ("u",), self.sd[src + ".weight_u"])
            _put(self.sn, dst + ("v",), self.sd[src + ".weight_v"])
            return self.sd[src + ".weight_orig"]
        self.missing.append(src + ".weight[_orig]")
        return None

    def dense(self, src: str, dst: tuple, bias: bool = True):
        w = self._weight(src, dst)
        if w is not None:
            _put(self.params, dst + ("kernel",), w.T)
        if bias and src + ".bias" in self.sd:
            _put(self.params, dst + ("bias",), self.sd[src + ".bias"])

    def conv(self, src: str, dst: tuple, bias: bool = True):
        w = self._weight(src, dst)
        if w is not None:
            _put(self.params, dst + ("kernel",), w.transpose(2, 3, 1, 0))
        if bias and src + ".bias" in self.sd:
            _put(self.params, dst + ("bias",), self.sd[src + ".bias"])

    def embedding(self, src: str, dst: tuple):
        w = self._weight(src, dst)
        if w is not None:
            _put(self.params, dst + ("embedding",), w)

    def bn(self, src: str, dst: tuple, affine: bool):
        if affine:
            if src + ".weight" in self.sd:
                _put(self.params, dst + ("scale",), self.sd[src + ".weight"])
            if src + ".bias" in self.sd:
                _put(self.params, dst + ("bias",), self.sd[src + ".bias"])
        _put(self.stats, dst + ("mean",), self._get(src + ".running_mean"))
        _put(self.stats, dst + ("var",), self._get(src + ".running_var"))
        nbt = self.sd.get(src + ".num_batches_tracked", np.zeros(()))
        _put(self.stats, dst + ("n",), np.asarray(nbt, np.float32))

    def cbn(self, src: str, dst: tuple):
        """ConditionalBatchNorm2d: gain/bias linears + affine-free BN
        (reference ops.py:14-28)."""
        self.dense(src + ".gain", dst + ("gain",), bias=False)
        self.dense(src + ".bias", dst + ("bias",), bias=False)
        self.bn(src + ".bn", dst + ("bn",), affine=False)

    def attention(self, src: str, dst_name: str):
        for t_name, o_name in (("conv1x1_theta", "theta"), ("conv1x1_phi", "phi"),
                               ("conv1x1_g", "g"), ("conv1x1_attn", "attn_out")):
            self.conv(f"{src}.{t_name}", (dst_name, o_name), bias=False)
        if src + ".sigma" in self.sd:
            _put(self.params, (dst_name, "sigma"), self.sd[src + ".sigma"])

    def stem_dense(self, src: str, dst: tuple, channels: int, bottom: int):
        """The G stem linear (linear0) feeds a reshape whose layout
        convention DIFFERS between frameworks: torch views the output as
        (N, C, b, b) (C-major, reference big_resnet.py:133) while our
        NHWC model reshapes to (N, b, b, C).  The output axis (kernel
        columns, bias, and the SN ``u`` vector) must be permuted
        C-major -> HWC-major or the loaded model computes a different
        function despite identical trees."""
        p = _stem_perm(channels, bottom)
        w = self._weight(src, dst)
        if w is not None:
            _put(self.params, dst + ("kernel",), w.T[:, p])
        u_path = dst + ("u",)
        u = self._node_sn(u_path)
        if u is not None:
            _put(self.sn, u_path, np.asarray(u).reshape(-1)[p])
        if src + ".bias" in self.sd:
            _put(self.params, dst + ("bias",), self.sd[src + ".bias"][p])

    def _node_sn(self, path: tuple):
        node = self.sn
        for k in path:
            if not isinstance(node, dict) or k not in node:
                return None
            node = node[k]
        return node

    def module_exists(self, src: str, dst: tuple) -> bool:
        """Presence probe for optional submodules (import side: any
        torch key under ``src.``)."""
        prefix = src + "."
        return any(k.startswith(prefix) for k in self.sd)

    def variables(self) -> dict:
        out = {"params": self.params}
        if self.stats:
            out["batch_stats"] = self.stats
        if self.sn:
            out["sn"] = self.sn
        return out


class _Exporter:
    """Inverse of :class:`_Mapper`: walks the same mapping (via
    ``_walk_generator``/``_walk_discriminator``) but READS our flax
    variable trees and WRITES a torch-style state dict with the
    reference's exact names + tensor conventions (Dense kernel.T,
    Conv HWIO->OIHW, SN weight_orig + u/v buffers, BN running stats)."""

    def __init__(self, variables: dict):
        # values are converted with np.asarray at access time, so the
        # trees may hold numpy or device arrays (flax FrozenDicts are
        # unwrapped by the dict() calls in _node's isinstance check)
        self.params = variables.get("params", {})
        self.stats = variables.get("batch_stats", {})
        self.sn_tree = variables.get("sn", {})
        self.sd: dict = {}
        self.missing: list[str] = []

    def _node(self, tree, path: tuple):
        from collections.abc import Mapping
        for k in path:
            if not isinstance(tree, Mapping) or k not in tree:
                return None
            tree = tree[k]
        return tree

    def _weight_out(self, src: str, dst: tuple, w: np.ndarray):
        sn = self._node(self.sn_tree, dst)
        if sn is not None and "u" in sn:
            self.sd[src + ".weight_orig"] = w
            self.sd[src + ".weight_u"] = np.asarray(sn["u"]).reshape(-1)
            self.sd[src + ".weight_v"] = np.asarray(sn["v"]).reshape(-1)
        else:
            self.sd[src + ".weight"] = w

    def dense(self, src: str, dst: tuple, bias: bool = True):
        node = self._node(self.params, dst)
        if node is None or "kernel" not in node:
            self.missing.append(src + ".weight")
            return
        self._weight_out(src, dst, np.asarray(node["kernel"]).T)
        if bias and "bias" in node:
            self.sd[src + ".bias"] = np.asarray(node["bias"])

    def conv(self, src: str, dst: tuple, bias: bool = True):
        node = self._node(self.params, dst)
        if node is None or "kernel" not in node:
            self.missing.append(src + ".weight")
            return
        self._weight_out(
            src, dst, np.asarray(node["kernel"]).transpose(3, 2, 0, 1))
        if bias and "bias" in node:
            self.sd[src + ".bias"] = np.asarray(node["bias"])

    def embedding(self, src: str, dst: tuple):
        node = self._node(self.params, dst)
        if node is None or "embedding" not in node:
            self.missing.append(src + ".weight")
            return
        self._weight_out(src, dst, np.asarray(node["embedding"]))

    def bn(self, src: str, dst: tuple, affine: bool):
        if affine:
            node = self._node(self.params, dst)
            if node is not None:
                self.sd[src + ".weight"] = np.asarray(node["scale"])
                self.sd[src + ".bias"] = np.asarray(node["bias"])
        st = self._node(self.stats, dst)
        if st is None:
            self.missing.append(src + ".running_mean")
            return
        self.sd[src + ".running_mean"] = np.asarray(st["mean"])
        self.sd[src + ".running_var"] = np.asarray(st["var"])
        self.sd[src + ".num_batches_tracked"] = np.asarray(
            st.get("n", 0.0)).astype(np.int64).reshape(())

    def cbn(self, src: str, dst: tuple):
        self.dense(src + ".gain", dst + ("gain",), bias=False)
        self.dense(src + ".bias", dst + ("bias",), bias=False)
        self.bn(src + ".bn", dst + ("bn",), affine=False)

    def attention(self, src: str, dst_name: str):
        for t_name, o_name in (("conv1x1_theta", "theta"), ("conv1x1_phi", "phi"),
                               ("conv1x1_g", "g"), ("conv1x1_attn", "attn_out")):
            self.conv(f"{src}.{t_name}", (dst_name, o_name), bias=False)
        node = self._node(self.params, (dst_name,))
        if node is not None and "sigma" in node:
            self.sd[src + ".sigma"] = np.asarray(node["sigma"])

    def stem_dense(self, src: str, dst: tuple, channels: int, bottom: int):
        """Inverse of _Mapper.stem_dense: permute the G stem linear's
        output axis HWC-major -> C-major for torch's view(N, C, b, b)."""
        node = self._node(self.params, dst)
        if node is None or "kernel" not in node:
            self.missing.append(src + ".weight")
            return
        p = _stem_perm(channels, bottom)
        kernel = np.asarray(node["kernel"])
        wT = np.empty_like(kernel)
        wT[:, p] = kernel
        sn = self._node(self.sn_tree, dst)
        if sn is not None and "u" in sn:
            self.sd[src + ".weight_orig"] = wT.T
            u = np.asarray(sn["u"]).reshape(-1)
            ut = np.empty_like(u)
            ut[p] = u
            self.sd[src + ".weight_u"] = ut
            self.sd[src + ".weight_v"] = np.asarray(sn["v"]).reshape(-1)
        else:
            self.sd[src + ".weight"] = wT.T
        if "bias" in node:
            bias = np.asarray(node["bias"])
            bt = np.empty_like(bias)
            bt[p] = bias
            self.sd[src + ".bias"] = bt

    def module_exists(self, src: str, dst: tuple) -> bool:
        """Presence probe (export side: the flax params subtree)."""
        return self._node(self.params, dst) is not None


def export_generator(variables: dict, cfg) -> tuple[dict, list[str]]:
    """Our Generator flax variables -> reference-named torch state dict
    (numpy values; exact inverse of :func:`convert_generator`)."""
    m = _Exporter(variables)
    _walk_generator(m, cfg)
    return m.sd, m.missing


def export_discriminator(variables: dict, cfg) -> tuple[dict, list[str]]:
    """Our Discriminator flax variables -> reference-named torch state
    dict (exact inverse of :func:`convert_discriminator`)."""
    m = _Exporter(variables)
    _walk_discriminator(m, cfg)
    return m.sd, m.missing


def _stem_perm(channels: int, bottom: int) -> np.ndarray:
    """Index permutation p with p[o_ours] = o_torch for the G stem
    linear's output axis: ours enumerates (y, x, c) (NHWC reshape),
    torch enumerates (c, y, x) (view(N, C, b, b))."""
    return np.transpose(
        np.arange(channels * bottom * bottom).reshape(channels, bottom,
                                                      bottom),
        (1, 2, 0)).reshape(-1)


def _block_layout(num_blocks: int, attn_locs) -> list[tuple[str, int]]:
    """Replicate the reference's blocks list construction
    (big_resnet.py:104-117): GenBlock i, then attention after i if
    (i+1) in attn_locs."""
    layout = []
    for i in range(num_blocks):
        layout.append(("block", i))
        if (i + 1) in attn_locs:
            layout.append(("attn", i))
    return layout


def convert_generator(sd: dict, cfg) -> tuple[dict, list[str]]:
    """Reference big_resnet/resnet Generator state dict -> flax variables."""
    m = _Mapper(sd)
    _walk_generator(m, cfg)
    return m.variables(), m.missing


def _walk_generator(m, cfg) -> None:
    """The torch-name <-> flax-path mapping walk for the resnet-family
    Generator (reference big_resnet.py:104-117 module structure).
    Direction-agnostic: driven by an import _Mapper or an export
    _Exporter (same method protocol)."""
    from studiogan_tpu.models.common import g_dims
    M = cfg.MODEL
    in_dims, out_dims = g_dims(cfg.DATA.img_size, M.g_conv_dim)
    attn_locs = tuple(a for a in M.attn_g_loc if a != NA) if M.apply_attn else ()
    layout = _block_layout(len(out_dims), attn_locs)

    m.stem_dense("linear0", ("linear0",), channels=in_dims[0], bottom=4)
    if M.g_cond_mtd != "W/O" and M.backbone == "big_resnet":
        m.embedding("shared", ("shared",))
    conditional = (M.backbone == "big_resnet" or M.g_cond_mtd == "cBN"
                   or M.g_info_injection == "cBN")
    for pos, (kind, i) in enumerate(layout):
        src = f"blocks.{pos}.0"
        if kind == "attn":
            m.attention(src, f"attn{i}")
            continue
        dst = f"block{i}"
        for bn_name in ("bn1", "bn2"):
            if conditional:
                m.cbn(f"{src}.{bn_name}", (dst, bn_name))
            else:
                m.bn(f"{src}.{bn_name}", (dst, bn_name), affine=True)
        for c_src, c_dst in (("conv2d0", "conv0"), ("conv2d1", "conv1"),
                             ("conv2d2", "conv2")):
            m.conv(f"{src}.{c_src}", (dst, c_dst))
    m.bn("bn4", ("bn4",), affine=True)
    m.conv("conv2d5", ("conv5",))


def convert_discriminator(sd: dict, cfg) -> tuple[dict, list[str]]:
    """Reference big_resnet/resnet Discriminator state dict -> flax vars."""
    m = _Mapper(sd)
    _walk_discriminator(m, cfg)
    return m.variables(), m.missing


def _walk_discriminator(m, cfg) -> None:
    """Direction-agnostic mapping walk for the resnet-family
    Discriminator (reference resnet.py:207-230 / big_resnet.py)."""
    from studiogan_tpu.models.common import d_dims
    M = cfg.MODEL
    in_dims, out_dims, down = d_dims(cfg.DATA.img_size, M.d_conv_dim)
    attn_locs = tuple(a for a in M.attn_d_loc if a != NA) if M.apply_attn else ()
    layout = _block_layout(len(in_dims), attn_locs)

    for pos, (kind, i) in enumerate(layout):
        src = f"blocks.{pos}.0"
        if kind == "attn":
            m.attention(src, f"attn{i}")
            continue
        dst = f"block{i}"
        # conv2d1/conv2d2 always exist; conv2d0 exists iff first block or
        # downsample/ch_mismatch (reference resnet.py:207-230)
        has_conv0 = (i == 0 or down[i] or in_dims[i] != out_dims[i]
                     or m.module_exists(f"{src}.conv2d0", (dst, "conv0")))
        if has_conv0:
            m.conv(f"{src}.conv2d0", (dst, "conv0"))
        m.conv(f"{src}.conv2d1", (dst, "conv1"))
        m.conv(f"{src}.conv2d2", (dst, "conv2"))
        if not M.apply_d_sn:
            for bn_name in ("bn0", "bn1", "bn2"):
                if m.module_exists(f"{src}.{bn_name}", (dst, bn_name)):
                    m.bn(f"{src}.{bn_name}", (dst, bn_name), affine=True)

    m.dense("linear1", ("head", "linear1"))
    if M.d_cond_mtd == "AC":
        m.dense("linear2", ("head", "linear2"), bias=False)
    elif M.d_cond_mtd == "PD":
        m.embedding("embedding", ("head", "embedding"))
    elif M.d_cond_mtd in ("2C", "D2DCE"):
        m.dense("linear2", ("head", "linear2"))
        m.embedding("embedding", ("head", "embedding"))
    if M.aux_cls_type == "TAC":
        m.dense("linear_mi", ("head", "linear_mi"),
                bias=M.d_cond_mtd in ("2C", "D2DCE"))
        if M.d_cond_mtd in ("2C", "D2DCE"):
            m.embedding("embedding_mi", ("head", "embedding_mi"))
    for q in ("info_discrete_linear", "info_conti_mu_linear",
              "info_conti_var_linear"):
        if m.module_exists(q, ("head", q)):
            m.dense(q, ("head", q), bias=False)


# ---------------------------------------------------------------------------
# StyleGAN2 checkpoints (reference src/models/stylegan2.py; the torch and
# flax modules deliberately share parameter layouts — FCL weight (out,in),
# conv weight OIHW, bias/bias_gain convention — so conversion is a pure
# renaming walk plus the const buffer's CHW->HWC transpose).
# ---------------------------------------------------------------------------


def _sg_channels(cfg):
    from studiogan_tpu.models.stylegan2 import (_block_channels,
                                                _stylegan_channel_policy)
    channel_base, channel_max, _, _ = _stylegan_channel_policy(cfg)
    return _block_channels(cfg.DATA.img_size, channel_base, channel_max)


class _SGMapper(_Mapper):
    def __init__(self, sd):
        super().__init__(sd)
        self.buffers: dict = {}
        self.stats_ema: dict = {}

    def fcl(self, src: str, dst: tuple, bias: bool = True):
        """FullyConnectedLayer: weight (out,in) stored identically in both
        frameworks (reference stylegan2.py:113-116 vs our
        models/stylegan2.py:50-66) -> verbatim copy."""
        w = self._get(src + ".weight")
        if w is not None:
            _put(self.params, dst + ("weight",), w)
        if bias:
            b = self._get(src + ".bias")
            if b is not None:
                _put(self.params, dst + ("bias",), b)

    def sg_conv(self, src: str, dst: tuple, bias: bool = True):
        """Conv2dLayer / SynthesisLayer weight: OIHW in both."""
        w = self._get(src + ".weight")
        if w is not None:
            _put(self.params, dst + ("weight",), w)
        if bias:
            b = self._get(src + ".bias")
            if b is not None:
                _put(self.params, dst + ("bias",), b)

    def cond_mapping(self, src: str, dst: tuple, num_layers: int,
                     with_embed: bool = True):
        """Head MappingNetwork (z_dim=0): embed + fc{i} stack."""
        if with_embed:
            self.fcl(src + ".embed", dst + ("embed",))
        for i in range(num_layers):
            self.fcl(f"{src}.fc{i}", dst + (f"fc{i}",))

    def variables(self) -> dict:
        out = {"params": self.params}
        if self.buffers:
            out["buffers"] = self.buffers
        if self.stats_ema:
            out["stats_ema"] = self.stats_ema
        return out


def convert_stylegan_generator(sd: dict, cfg) -> tuple[dict, list[str]]:
    """Reference stylegan2 Generator state dict -> flax variables
    (mapping.* / synthesis.b{res}.* naming, reference stylegan2.py:512-548,
    190-264, 344-452)."""
    m = _SGMapper(sd)
    M = cfg.MODEL
    resolutions, _ = _sg_channels(cfg)

    c_dim = cfg.DATA.num_classes if M.g_cond_mtd == "cAdaIN" else 0
    if c_dim > 0:
        m.fcl("mapping.embed", ("mapping", "embed"))
    for i in range(cfg.STYLEGAN.mapping_network):
        m.fcl(f"mapping.fc{i}", ("mapping", f"fc{i}"))
    w_avg = m._get("mapping.w_avg")
    if w_avg is not None:
        _put(m.stats_ema, ("mapping", "w_avg"), w_avg)

    for res in resolutions:
        src = f"synthesis.b{res}"
        dst = ("synthesis", f"b{res}")
        if res == 4:
            const = m._get(f"{src}.const")
            if const is not None:  # torch (C,H,W) -> flax (H,W,C)
                _put(m.params, dst + ("const",), const.transpose(1, 2, 0))
            convs = ["conv1"]
        else:
            convs = ["conv0", "conv1"]
        for cv in convs:
            m.sg_conv(f"{src}.{cv}", dst + (cv,))
            m.fcl(f"{src}.{cv}.affine", dst + (cv, "affine"))
            ns = m._get(f"{src}.{cv}.noise_strength")
            if ns is not None:
                _put(m.params, dst + (cv, "noise_strength"), ns)
            nc = m.sd.get(f"{src}.{cv}.noise_const")
            if nc is not None:
                _put(m.buffers, dst + (cv, "noise_const"), nc)
        m.sg_conv(f"{src}.torgb", dst + ("torgb",))
        m.fcl(f"{src}.torgb.affine", dst + ("torgb", "affine"))
    return m.variables(), m.missing


def convert_stylegan_discriminator(sd: dict, cfg) -> tuple[dict, list[str]]:
    """Reference stylegan2 Discriminator state dict -> flax variables
    (b{res}.* trunk + StudioGAN conditioning heads,
    reference stylegan2.py:734-923)."""
    m = _SGMapper(sd)
    M = cfg.MODEL
    resolutions, _ = _sg_channels(cfg)
    arch = (cfg.STYLEGAN.d_architecture
            if cfg.STYLEGAN.d_architecture != NA else "resnet")
    img_resolution = cfg.DATA.img_size

    for res in reversed(resolutions):  # img_res down to 8
        if res == 4:
            continue
        src = dst_name = f"b{res}"
        dst = (dst_name,)
        if res == img_resolution or arch == "skip":
            m.sg_conv(f"{src}.fromrgb", dst + ("fromrgb",))
        m.sg_conv(f"{src}.conv0", dst + ("conv0",))
        m.sg_conv(f"{src}.conv1", dst + ("conv1",))
        if arch == "resnet":
            m.sg_conv(f"{src}.skip", dst + ("skip",), bias=False)
    if arch == "skip":
        m.sg_conv("b4.fromrgb", ("b4", "fromrgb"))
    m.sg_conv("b4.conv", ("b4", "conv"))
    m.fcl("b4.fc", ("b4", "fc"))

    # heads (reference stylegan2.py:796-841)
    c_dim = (cfg.DATA.num_classes
             if M.d_cond_mtd in tuple(cfg.STYLEGAN.cond_type) else 0)
    if M.aux_cls_type == "ADC":
        c_dim *= 2
    m.fcl("linear1", ("linear1",))
    if M.d_cond_mtd == "AC":
        m.fcl("linear2", ("linear2",), bias=False)
    elif M.d_cond_mtd == "PD":
        # reference constructs linear2 but its forward uses an undefined
        # self.embedding (stylegan2.py:813 vs :880) — unreachable in shipped
        # configs; map linear2 onto our "embedding" head when shapes permit.
        if "embedding.weight" in m.sd:
            m.fcl("embedding", ("embedding",))
    elif M.d_cond_mtd == "SPD" and c_dim > 0:
        m.cond_mapping("mapping", ("mapping",), num_layers=8)
    elif M.d_cond_mtd in ("2C", "D2DCE"):
        m.fcl("linear2", ("linear2",))
        m.cond_mapping("embedding", ("embedding",), num_layers=1)
    if M.aux_cls_type == "TAC":
        if M.d_cond_mtd == "AC":
            m.fcl("linear_mi", ("linear_mi",), bias=False)
        elif M.d_cond_mtd in ("2C", "D2DCE"):
            m.fcl("linear_mi", ("linear_mi",))
            m.cond_mapping("embedding_mi", ("embedding_mi",), num_layers=1)
    if M.info_type in ("discrete", "both"):
        m.fcl("info_discrete_linear", ("info_discrete_linear",), bias=False)
    if M.info_type in ("continuous", "both"):
        m.fcl("info_conti_mu_linear", ("info_conti_mu_linear",), bias=False)
        m.fcl("info_conti_var_linear", ("info_conti_var_linear",), bias=False)
    return m.variables(), m.missing


def _sg3_layer_plan(cfg, channel_base=None, channel_max=None):
    """Replicate the SG3 layer-plan math (reference stylegan3.py:400-456 /
    our models/stylegan3.py:245-259) to reconstruct the reference's
    ``L{idx}_{out_size}_{out_channels}`` layer names."""
    from studiogan_tpu.models.stylegan2 import _stylegan_channel_policy
    if channel_base is None or channel_max is None:
        channel_base, channel_max, _, _ = _stylegan_channel_policy(cfg)
        if cfg.STYLEGAN.stylegan3_cfg == "stylegan3-r":
            channel_base, channel_max = channel_base * 2, channel_max * 2
    num_layers, num_critical = 14, 2
    img_resolution = cfg.DATA.img_size
    first_cutoff, first_stopband = 2.0, 2 ** 2.1
    last_cutoff = img_resolution / 2
    last_stopband = last_cutoff * (2 ** 0.3)
    exponents = np.minimum(
        np.arange(num_layers + 1) / (num_layers - num_critical), 1)
    cutoffs = first_cutoff * (last_cutoff / first_cutoff) ** exponents
    stopbands = first_stopband * (last_stopband / first_stopband) ** exponents
    sampling_rates = np.exp2(np.ceil(np.log2(
        np.minimum(stopbands * 2, img_resolution))))
    sizes = sampling_rates + 10 * 2
    sizes[-2:] = img_resolution
    channels = np.rint(np.minimum((channel_base / 2) / cutoffs, channel_max))
    channels[-1] = cfg.DATA.img_channels
    return [f"L{idx}_{int(sizes[idx])}_{int(channels[idx])}"
            for idx in range(num_layers + 1)]


def convert_stylegan3_generator(sd: dict, cfg, channel_base=None,
                                channel_max=None) -> tuple[dict, list[str]]:
    """Reference stylegan3 Generator state dict -> flax variables
    (reference stylegan3.py:483-520; our layers are named ``L{idx}`` with
    the affine FCL as ``affine_fc``)."""
    m = _SGMapper(sd)
    M = cfg.MODEL

    c_dim = cfg.DATA.num_classes if M.g_cond_mtd == "cAdaIN" else 0
    if c_dim > 0:
        m.fcl("mapping.embed", ("mapping", "embed"))
    for i in range(cfg.STYLEGAN.mapping_network):
        m.fcl(f"mapping.fc{i}", ("mapping", f"fc{i}"))
    w_avg = m._get("mapping.w_avg")
    if w_avg is not None:
        _put(m.stats_ema, ("mapping", "w_avg"), w_avg)

    m.fcl("synthesis.input.affine", ("synthesis", "input", "affine"))
    w = m._get("synthesis.input.weight")
    if w is not None:
        _put(m.params, ("synthesis", "input", "weight"), w)
    for buf in ("freqs", "phases", "transform"):
        v = m._get(f"synthesis.input.{buf}")
        if v is not None:
            _put(m.buffers, ("synthesis", "input", buf), v)

    for idx, ref_name in enumerate(
            _sg3_layer_plan(cfg, channel_base, channel_max)):
        src = f"synthesis.{ref_name}"
        dst = ("synthesis", f"L{idx}")
        m.fcl(f"{src}.affine", dst + ("affine_fc",))
        for leaf in ("weight", "bias"):
            v = m._get(f"{src}.{leaf}")
            if v is not None:
                _put(m.params, dst + (leaf,), v)
        me = m._get(f"{src}.magnitude_ema")
        if me is not None:
            _put(m.stats_ema, dst + ("magnitude_ema",), me)
    return m.variables(), m.missing


_BUFFER_SUFFIXES = (".weight_u", ".weight_v", ".running_mean",
                    ".running_var", ".num_batches_tracked")


def _torch_adam_skeleton(sd: dict, lr: float, betas, weight_decay: float,
                         eps: float) -> dict:
    """A torch.optim.Adam ``state_dict()`` the reference can
    ``load_state_dict``: correct param-group structure/count with empty
    per-param state (moments re-initialize lazily on the first torch
    step, exactly like the reference's own weights-only resume path,
    ckpt.py:88-103)."""
    n_params = sum(1 for k in sd if not k.endswith(_BUFFER_SUFFIXES))
    return {
        "state": {},
        "param_groups": [{
            "lr": lr, "betas": tuple(betas), "eps": eps,
            "weight_decay": weight_decay, "amsgrad": False,
            "maximize": False, "foreach": None, "capturable": False,
            "differentiable": False, "fused": None,
            "params": list(range(n_params)),
        }],
    }


def save_reference_checkpoint(state, cfg, ckpt_dir: str,
                              when: str = "current",
                              run_name: str = "studiogan_tpu_export",
                              epoch: int = 0, best_step: int = 0,
                              best_fid=None) -> list[str]:
    """Write the reference's ``model={G|D|G_ema}-{when}-weights-step={n}.pth``
    triplet (reference src/utils/misc.py:394 naming, worker.py:940-983
    payload) from a :class:`GANTrainState`, loadable by the reference's
    ``load_StudioGAN_ckpts`` (ckpt.py:77-134).  Inverse of
    :func:`load_reference_checkpoint` for the resnet-family backbones.

    The D file carries the reference's run-metadata dict (seed, step,
    topk, aa_p, best_fid, lecam_emas...).  Optimizer entries are valid
    empty-state Adam skeletons — moments live in optax's layout and
    re-initialize torch-side on first step.  Returns the written paths."""
    import os

    import torch

    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(np.asarray(state.step))
    O, L = cfg.OPTIMIZATION, cfg.LOSS

    def _to_torch(sd: dict) -> dict:
        return {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}

    g_sd, g_missing = export_generator(
        {"params": state.g_params, **(state.g_state or {})}, cfg)
    d_sd, d_missing = export_discriminator(
        {"params": state.d_params, **(state.d_state or {})}, cfg)
    if g_missing or d_missing:
        raise ValueError(
            f"export incomplete: G missing {g_missing}, D missing "
            f"{d_missing} — backbone {cfg.MODEL.backbone!r} not coverable "
            "by the resnet-family exporter?")

    # the reference always saves its LeCamEMA.__dict__ (init 7777,
    # ops.py:106-116) even when LeCam is unused
    if state.lecam is not None:
        lecam_emas = {k: float(np.asarray(v)) for k, v in state.lecam.items()}
    else:
        lecam_emas = {k: 7777.0 for k in ("G_loss", "D_loss_real",
                                          "D_loss_fake", "D_real", "D_fake")}
    lecam_emas["decay"] = L.lecam_ema_decay
    lecam_emas["start_itr"] = L.lecam_ema_start_iter

    g_states = {
        "state_dict": _to_torch(g_sd),
        "optimizer": _torch_adam_skeleton(
            g_sd, O.g_lr, (O.beta1, O.beta2), O.g_weight_decay, 1e-6),
    }
    d_states = {
        "state_dict": _to_torch(d_sd),
        "optimizer": _torch_adam_skeleton(
            d_sd, O.d_lr, (O.beta1, O.beta2), O.d_weight_decay, 1e-6),
        "seed": cfg.RUN.seed,
        "run_name": run_name,
        "step": step,
        "epoch": epoch,
        "topk": float(np.asarray(state.topk)),
        "aa_p": float(np.asarray(state.ada_p)),
        "best_step": best_step,
        "best_fid": best_fid,
        "best_fid_ckpt": ckpt_dir,
        "lecam_emas": lecam_emas,
    }

    paths = []
    triplet = [("G", g_states)]
    if state.g_ema_params is not None:
        ema_sd, ema_missing = export_generator(
            {"params": state.g_ema_params, **(state.g_ema_state or {})}, cfg)
        if ema_missing:
            raise ValueError(f"G_ema export incomplete: {ema_missing}")
        triplet.append(("G_ema", {"state_dict": _to_torch(ema_sd)}))
    triplet.append(("D", d_states))
    for tag, states in triplet:
        path = os.path.join(
            ckpt_dir, f"model={tag}-{when}-weights-step={step}.pth")
        torch.save(states, path)
        paths.append(path)
    return paths


def load_reference_checkpoint(ckpt_dir: str, cfg, load_best: bool = False):
    """Read the reference's model=G/D/G_ema .pth triplet (ckpt.py:77-134).
    Returns dict with 'g', 'd', 'g_ema' flax variable trees + metadata."""
    import glob
    import os

    import torch

    when = "best" if load_best else "current"
    out = {}
    meta = {}
    for tag, key in (("G", "g"), ("D", "d"), ("G_ema", "g_ema")):
        paths = sorted(glob.glob(os.path.join(
            ckpt_dir, f"model={tag}-{when}-weights-step=*.pth")))
        if not paths:
            continue
        ckpt = torch.load(paths[-1], map_location="cpu", weights_only=False)
        sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()}
        if cfg.MODEL.backbone == "stylegan2":
            conv = (convert_stylegan_discriminator if tag == "D"
                    else convert_stylegan_generator)
        elif cfg.MODEL.backbone == "stylegan3":
            # SG3 D is the SG2 D; the SG3 synthesis converter is separate
            conv = (convert_stylegan_discriminator if tag == "D"
                    else convert_stylegan3_generator)
        else:
            conv = convert_discriminator if tag == "D" else convert_generator
        variables, missing = conv(sd, cfg)
        out[key] = variables
        if missing:
            out[f"{key}_missing"] = missing
        if tag == "D":
            meta = {k: ckpt.get(k) for k in
                    ("seed", "run_name", "step", "epoch", "topk", "aa_p",
                     "best_step", "best_fid", "lecam_emas") if k in ckpt}
    out["metadata"] = meta
    return out
