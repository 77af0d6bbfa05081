"""Interop evidence: a chip-trained BigGAN checkpoint round-trips into
the reference's own torch modules (round-4 verdict item 9).

Pipeline:
  1. train BigGAN-CIFAR (configs/CIFAR10/BigGAN.yaml) for N steps on the
     structured drop via the real CLI (one final orbax checkpoint);
  2. re-invoke the CLI with --export_pth to write the reference's
     model={G|D|G_ema}-current-weights-step=N.pth triplet
     (train/convert.py save_reference_checkpoint);
  3. import the REFERENCE's models.big_resnet + utils.ops from
     /root/reference/src (torchvision/pkg_resources stubbed, same shim
     as tests/test_pth_export.py), build its Generator/Discriminator at
     the real CIFAR dims, torch-load our .pth files with STRICT key
     matching, and run a forward pass.

Writes docs/evidence/pth_export_biggan_cifar/ with the CLI logs, the
torch-side load/forward log, and a summary.json.

Usage (quiet machine, single TPU process for step 1):
    python scripts/export_pth_evidence.py [n_steps]
"""
from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, ".data", "structured_cifar")
EVIDENCE = os.path.join(REPO, "docs", "evidence", "pth_export_biggan_cifar")


def _run(cmd, log_path, extra_env=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra_env or {})
    t0 = time.time()
    with open(log_path, "w") as f:
        rc = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                            env=env).returncode
    print(f"{os.path.basename(log_path)}: rc={rc} "
          f"({time.time()-t0:.0f}s)", flush=True)
    assert rc == 0, f"failed, see {log_path}"


def torch_side_check(cfg_path: str, pth_dir: str, log_path: str) -> dict:
    """Strict-load the exported triplet into the reference's torch
    modules and run a forward (runs in-process; call via the
    _torch_child subcommand so torch never shares the TPU process)."""
    import types

    import numpy as np
    import packaging.version
    import torch

    # --- reference import shims (same as tests/test_pth_export.py) ----
    tv = types.ModuleType("torchvision")
    tv.__path__ = []
    sys.modules.setdefault("torchvision", tv)
    for name, attrs in [
            ("torchvision.datasets",
             {"CIFAR10": object, "CIFAR100": object, "ImageFolder": object}),
            ("torchvision.utils", {"save_image": lambda *a, **k: None}),
            ("torchvision.transforms", {}),
    ]:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules.setdefault(name, mod)
        setattr(tv, name.split(".")[-1], mod)
    if "pkg_resources" not in sys.modules:
        fake = types.ModuleType("pkg_resources")
        fake.parse_version = packaging.version.parse
        sys.modules["pkg_resources"] = fake
    ref = "/root/reference/src"
    sys.path.insert(0, ref)
    import importlib
    big_resnet = importlib.import_module("models.big_resnet")
    ref_ops = importlib.import_module("utils.ops")

    m = types.SimpleNamespace(
        g_conv2d=ref_ops.snconv2d, g_deconv2d=ref_ops.sndeconv2d,
        g_linear=ref_ops.snlinear, g_embedding=ref_ops.sn_embedding,
        d_conv2d=ref_ops.snconv2d, d_deconv2d=ref_ops.sndeconv2d,
        d_linear=ref_ops.snlinear, d_embedding=ref_ops.sn_embedding,
        g_bn=ref_ops.ConditionalBatchNorm2d,
        g_act_fn=torch.nn.ReLU(inplace=True),
        d_act_fn=torch.nn.ReLU(inplace=True))

    sys.path.insert(0, REPO)
    from studiogan_tpu.config import Configurations
    cfg = Configurations(cfg_path)
    cfg.finalize()
    M = cfg.MODEL
    G = big_resnet.Generator(
        z_dim=M.z_dim, g_shared_dim=M.g_shared_dim,
        img_size=cfg.DATA.img_size, g_conv_dim=M.g_conv_dim,
        apply_attn=M.apply_attn, attn_g_loc=M.attn_g_loc,
        g_cond_mtd=M.g_cond_mtd, num_classes=cfg.DATA.num_classes,
        g_init=False, g_depth="N/A", mixed_precision=False,
        MODULES=m, MODEL=M)
    D = big_resnet.Discriminator(
        img_size=cfg.DATA.img_size, d_conv_dim=M.d_conv_dim,
        apply_d_sn=M.apply_d_sn, apply_attn=M.apply_attn,
        attn_d_loc=M.attn_d_loc, d_cond_mtd=M.d_cond_mtd,
        aux_cls_type=M.aux_cls_type, d_embed_dim=M.d_embed_dim,
        normalize_d_embed=M.normalize_d_embed,
        num_classes=cfg.DATA.num_classes, d_init=False, d_depth="N/A",
        mixed_precision=False, MODULES=m, MODEL=M)

    out = {}
    with open(log_path, "w") as log:
        def p(msg):
            print(msg, file=log)
            print(msg, flush=True)

        for tag, module in [("G", G), ("G_ema", G), ("D", D)]:
            path = sorted(glob.glob(os.path.join(
                pth_dir, f"model={tag}-current-weights-step=*.pth")))[-1]
            payload = torch.load(path, map_location="cpu",
                                 weights_only=False)
            missing, unexpected = module.load_state_dict(
                payload["state_dict"], strict=True), None
            n_params = sum(v.numel() for v in module.state_dict().values())
            p(f"{tag}: STRICT load OK from {os.path.basename(path)} "
              f"({n_params:,} tensor elements)")
            out[tag] = {"file": os.path.basename(path),
                        "n_elements": int(n_params)}

        torch.manual_seed(0)
        z = torch.randn(8, M.z_dim)
        y = torch.arange(8) % cfg.DATA.num_classes
        G.eval(); D.eval()
        with torch.no_grad():
            imgs = G(z, y, eval=True)
            adv = D(imgs, y, eval=True)["adv_output"]
        p(f"forward: G(z,y) -> {tuple(imgs.shape)} "
          f"mean {imgs.mean().item():+.6f} std {imgs.std().item():.6f}")
        p(f"forward: D(G(z,y),y) adv_output mean {adv.mean().item():+.6f}")
        out["g_forward"] = {"mean": float(imgs.mean()),
                            "std": float(imgs.std())}
        out["d_forward_mean"] = float(adv.mean())
    return out


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "_torch_child":
        res = torch_side_check(sys.argv[2], sys.argv[3], sys.argv[4])
        print(json.dumps(res))
        return

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    work = os.path.join(REPO, ".data", "pth_export_run")
    os.makedirs(work, exist_ok=True)
    os.makedirs(EVIDENCE, exist_ok=True)
    cfg = yaml.safe_load(open(os.path.join(
        REPO, "configs", "CIFAR10", "BigGAN.yaml")))
    cfg["OPTIMIZATION"]["total_steps"] = n_steps
    cfg_path = os.path.join(work, "cfg.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    # 1. chip training via the real CLI
    _run([sys.executable, "-m", "studiogan_tpu.main", "-t",
          "-cfg", cfg_path, "-data", DATA, "-save", work,
          "-metrics", "none", "--print_freq", "200",
          "--save_freq", str(n_steps), "--seed", "11"],
         os.path.join(EVIDENCE, "train.log"))
    ckpt_dir = sorted(glob.glob(os.path.join(work, "checkpoints", "*")),
                      key=os.path.getmtime)[-1]

    # 2. export (CPU process — conversion only)
    pth_dir = os.path.join(work, "pth")
    _run([sys.executable, "-m", "studiogan_tpu.main",
          "-cfg", cfg_path, "-data", DATA, "-save", work,
          "-ckpt", ckpt_dir, "--export_pth", pth_dir, "--seed", "11",
          "-metrics", "none"],
         os.path.join(EVIDENCE, "export.log"),
         extra_env={"JAX_PLATFORMS": "cpu"})

    # 3. torch-side strict load + forward (own process: torch, no TPU)
    _run([sys.executable, os.path.abspath(__file__), "_torch_child",
          cfg_path, pth_dir, os.path.join(EVIDENCE, "torch_load.log")],
         os.path.join(EVIDENCE, "torch_child_stdout.log"),
         extra_env={"JAX_PLATFORMS": "cpu"})

    summary = {"n_steps": n_steps,
               "ckpt": os.path.basename(ckpt_dir),
               "pth_files": sorted(os.path.basename(p) for p in
                                   glob.glob(os.path.join(pth_dir, "*.pth")))}
    with open(os.path.join(EVIDENCE, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("evidence ->", EVIDENCE, flush=True)


if __name__ == "__main__":
    main()
