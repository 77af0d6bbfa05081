"""Weights-drop dress rehearsal (round-4 verdict item 7).

One command that exercises the ENTIRE pretrained-eval-backbone path —
file discovery (STUDIOGAN_WEIGHTS_DIR), torch.load, all 6 converters,
LoadEvalModel construction with the loaded-weights manifest line, and a
finite forward — so the day the real weight files land the path is
known-good, not first-run code.

    # rehearsal today (no egress): synthesize random-but-valid .pth
    # drops with the reference's exact file names + key layouts
    python scripts/weights_drop_rehearsal.py --simulate

    # the real drop:
    STUDIOGAN_WEIGHTS_DIR=/path/to/weights python scripts/weights_drop_rehearsal.py

In --simulate mode the backbones synthesized from a flax init
(InceptionV3_tf/_torch, ResNet50, SwAV trunk) are additionally checked
for EXACT round-trip (converted variables == the generating tree).
Exit 0 iff every present backbone loads as REAL with finite outputs.
For <0.1% FID value parity vs the reference torch pipeline run
`pytest tests/test_fid_value_parity.py` (DINO — the only backbone whose
reference implementation is pure-torch-runnable in this environment).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BACKBONES = ["InceptionV3_tf", "InceptionV3_torch", "ResNet50_torch",
             "SwAV_torch", "DINO_torch", "Swin-T_torch"]


def _flax_to_torch_walk(v):
    """Invert the inception converter conventions (conv kernel HWIO ->
    OIHW .weight, fc -> .T, BN -> weight/bias/running_*)."""
    sd = {}

    def walk(tree, prefix, kindmap):
        for k, leaf in tree.items():
            if isinstance(leaf, dict):
                walk(leaf, prefix + [k], kindmap)
            else:
                kindmap(prefix, k, np.asarray(leaf))

    def put(prefix, kind, arr):
        name = ".".join(prefix)
        if kind == "kernel" and prefix[-1] == "conv":
            sd[name + ".weight"] = arr.transpose(3, 2, 0, 1)
        elif kind == "kernel":
            sd[name + ".weight"] = arr.T
        elif kind == "scale":
            sd[name + ".weight"] = arr
        elif kind == "bias":
            sd[name + ".bias"] = arr
        elif kind == "mean":
            sd[name + ".running_mean"] = arr
        elif kind == "var":
            sd[name + ".running_var"] = arr

    walk(jax.device_get(v["params"]), [], put)
    walk(jax.device_get(v["batch_stats"]), [], put)
    return sd


def _save_pth(path, obj):
    import torch
    obj = jax.tree.map(
        lambda a: torch.from_numpy(np.ascontiguousarray(a))
        if isinstance(a, np.ndarray) else a, obj)
    torch.save(obj, path)


def synthesize_drop(drop_dir: str) -> dict:
    """Write random-but-valid .pth files with the reference's exact
    file names + state-dict key layouts; return {backbone: ground-truth
    flax tree or None} for the exact-roundtrip check."""
    from studiogan_tpu.metrics.backbones import ResNet50
    from studiogan_tpu.metrics.inception_v3 import InceptionV3
    from tests.test_eval_backbones import (TestDINOConverter, TestSwinConverter,
                                           resnet50_torch_sd)

    os.makedirs(drop_dir, exist_ok=True)
    truth = {}
    rng = np.random.RandomState(0)

    m = InceptionV3()
    v = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 299, 299, 3)))
    _save_pth(os.path.join(drop_dir, "pt_inception-2015-12-05-6726825d.pth"),
              _flax_to_torch_walk(v))
    truth["InceptionV3_tf"] = {"params": v["params"],
                               "batch_stats": v["batch_stats"]}

    m = InceptionV3(num_classes=1000, variant="torchvision",
                    transform_input=True)
    v = m.init(jax.random.PRNGKey(2), jnp.zeros((1, 299, 299, 3)))
    _save_pth(os.path.join(drop_dir, "inception_v3_google-0cc3c7bd.pth"),
              _flax_to_torch_walk(v))
    truth["InceptionV3_torch"] = {"params": v["params"],
                                  "batch_stats": v["batch_stats"]}

    m = ResNet50()
    v = m.init(jax.random.PRNGKey(3), jnp.zeros((1, 224, 224, 3)))
    rsd = resnet50_torch_sd(v)
    _save_pth(os.path.join(drop_dir, "resnet50-19c8e357.pth"), rsd)
    truth["ResNet50_torch"] = {"params": v["params"],
                               "batch_stats": v["batch_stats"]}

    # SwAV: the same trunk under module. prefixes (fc replaced by the
    # eval-linear file); reference preparation.py:62-69
    trunk = {"module." + k: a for k, a in rsd.items()
             if not k.startswith("fc.")}
    _save_pth(os.path.join(drop_dir, "swav_800ep_pretrain.pth.tar"),
              {"state_dict": trunk})
    _save_pth(os.path.join(drop_dir, "swav_800ep_eval_linear.pth.tar"),
              {"state_dict": {
                  "module.linear.weight": rng.randn(1000, 2048).astype(
                      np.float32) * 0.01,
                  "module.linear.bias": np.zeros((1000,), np.float32)}})
    truth["SwAV_torch"] = None  # fc differs; forward-only check

    # the test helpers build reduced-size models for speed — subclass
    # with the REAL architectures (DINO ViT-S/8, Swin-B/4-w7) so the
    # production converter defaults accept the files
    class _FullDINO(TestDINOConverter):
        DIM, DEPTH, HEADS, PATCH, IMG, NLAST, NCLS = 384, 12, 6, 8, 224, 4, 1000

    class _FullSwin(TestSwinConverter):
        IMG, PATCH, EMBED, WS = 224, 4, 128, 7
        DEPTHS, HEADS, NCLS = (2, 2, 18, 2), (4, 8, 16, 32), 1000

    dino_sd, dino_lin = _FullDINO()._random_sd(4)
    _save_pth(os.path.join(drop_dir, "dino_deitsmall8_pretrain.pth"),
              {"teacher": dino_sd})
    _save_pth(os.path.join(drop_dir, "dino_deitsmall8_linearweights.pth"),
              {"state_dict": dino_lin})
    truth["DINO_torch"] = None

    swin_sd = _FullSwin()._random_sd(5)
    _save_pth(os.path.join(drop_dir,
                           "swin_base_patch4_window7_224_22kto1k.pth"),
              {"model": swin_sd})
    truth["Swin-T_torch"] = None
    return truth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--simulate", action="store_true",
                    help="synthesize a random-but-valid weights drop "
                         "and rehearse against it")
    args = ap.parse_args()

    import logging
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    truth = {}
    if args.simulate:
        drop = tempfile.mkdtemp(prefix="weights_drop_sim_")
        print(f"synthesizing drop -> {drop}")
        truth = synthesize_drop(drop)
        os.environ["STUDIOGAN_WEIGHTS_DIR"] = drop
    elif not os.environ.get("STUDIOGAN_WEIGHTS_DIR"):
        print("Set STUDIOGAN_WEIGHTS_DIR (or pass --simulate).")
        return 2

    from studiogan_tpu.metrics.preparation import LoadEvalModel

    x = np.clip(np.random.RandomState(0).uniform(
        -1, 1, (4, 64, 64, 3)), -1, 1).astype(np.float32)
    manifest = {}
    ok = True
    for backbone in BACKBONES:
        entry = {}
        try:
            em = LoadEvalModel(backbone, "legacy", device_batch=4)
            entry["weights"] = ("RANDOM" if em.random_weights
                                else getattr(em, "weights_path", "?"))
            if em.random_weights:
                entry["status"] = "MISSING (random fallback)"
                ok = False
            else:
                feats, logits = em.get_outputs(x, quantize=True)
                entry["feat_dim"] = int(feats.shape[-1])
                entry["finite"] = bool(np.isfinite(feats).all()
                                       and np.isfinite(logits).all())
                entry["status"] = "ok" if entry["finite"] else "NON-FINITE"
                ok &= entry["finite"]
                if truth.get(backbone) is not None:
                    want = jax.tree.leaves(jax.device_get(truth[backbone]))
                    got = jax.tree.leaves(jax.device_get(em.variables))
                    same = (len(want) == len(got) and all(
                        np.allclose(np.asarray(a), np.asarray(b),
                                    atol=1e-7)
                        for a, b in zip(want, got)))
                    entry["exact_roundtrip"] = same
                    ok &= same
        except Exception as e:  # noqa: BLE001 - report every backbone
            entry["status"] = f"ERROR {type(e).__name__}: {e}"
            ok = False
        manifest[backbone] = entry
        print(f"{backbone:18s} {entry}")

    print(json.dumps({"ok": ok, "manifest": manifest}, default=str))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
