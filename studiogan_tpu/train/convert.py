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

    def variables(self) -> dict:
        out = {"params": self.params}
        if self.stats:
            out["batch_stats"] = self.stats
        if self.sn:
            out["sn"] = self.sn
        return out


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
    from studiogan_tpu.models.common import g_dims
    m = _Mapper(sd)
    M = cfg.MODEL
    _, out_dims = g_dims(cfg.DATA.img_size, M.g_conv_dim)
    attn_locs = tuple(a for a in M.attn_g_loc if a != NA) if M.apply_attn else ()
    layout = _block_layout(len(out_dims), attn_locs)

    m.dense("linear0", ("linear0",))
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
    return m.variables(), m.missing


def convert_discriminator(sd: dict, cfg) -> tuple[dict, list[str]]:
    """Reference big_resnet/resnet Discriminator state dict -> flax vars."""
    from studiogan_tpu.models.common import d_dims
    m = _Mapper(sd)
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
                     or any(k.startswith(f"{src}.conv2d0.") for k in m.sd))
        if has_conv0:
            m.conv(f"{src}.conv2d0", (dst, "conv0"))
        m.conv(f"{src}.conv2d1", (dst, "conv1"))
        m.conv(f"{src}.conv2d2", (dst, "conv2"))
        if not M.apply_d_sn:
            for bn_name in ("bn0", "bn1", "bn2"):
                if any(k.startswith(f"{src}.{bn_name}.") for k in m.sd):
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
        if any(k.startswith(q + ".") for k in m.sd):
            m.dense(q, ("head", q), bias=False)
    return m.variables(), m.missing


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
