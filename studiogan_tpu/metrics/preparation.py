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


class LoadEvalModel:
    """reference preparation.py:43-122."""

    def __init__(self, eval_backbone: str, post_resizer: str,
                 device_batch: int = 256):
        self.eval_backbone = eval_backbone
        self.post_resizer = post_resizer
        self.res = BACKBONE_RES[eval_backbone]
        self.random_weights = False

        if eval_backbone == "InceptionV3_tf":
            from studiogan_tpu.metrics.inception_v3 import InceptionV3, load_weights
            self.mean = np.array([0.5, 0.5, 0.5], np.float32)
            self.std = np.array([0.5, 0.5, 0.5], np.float32)
            model = InceptionV3()
            path = _find_weights(_INCEPTION_FILES)
            if path:
                variables = load_weights(path)
            else:
                warnings.warn(
                    "pt_inception weights not found (no-egress environment); "
                    "using RANDOM InceptionV3 weights — FID/IS values are NOT "
                    "comparable. Set STUDIOGAN_WEIGHTS_DIR.")
                self.random_weights = True
                variables = model.init(jax.random.PRNGKey(0),
                                       jnp.zeros((1, self.res, self.res, 3)))

            mean = jnp.asarray(self.mean)
            std = jnp.asarray(self.std)

            @jax.jit
            def forward(x):  # x: NHWC float in [0,255]
                x = (x / 255.0 - mean) / std
                return model.apply(variables, x)

            self._forward = forward
        elif eval_backbone in ("ResNet50_torch", "SwAV_torch", "DINO_torch"):
            from studiogan_tpu.metrics.backbones import (
                DINOViTSmall, ResNet50, convert_resnet50_torch)
            self.mean = np.array([0.485, 0.456, 0.406], np.float32)
            self.std = np.array([0.229, 0.224, 0.225], np.float32)
            if eval_backbone == "DINO_torch":
                model = DINOViTSmall()
                weight_names = ("dino_deitsmall8_pretrain_full_checkpoint.pth",
                                "dino_vits8.pth")
                converter = None  # converter lands with the weights drop
            else:
                model = ResNet50()
                weight_names = ({"ResNet50_torch": ("resnet50-19c8e357.pth",
                                                    "resnet50-0676ba61.pth"),
                                 "SwAV_torch": ("swav_800ep_pretrain.pth.tar",)}
                                [eval_backbone])
                converter = convert_resnet50_torch
            path = _find_weights(weight_names)
            if path and converter is not None:
                import torch
                sd = torch.load(path, map_location="cpu", weights_only=True)
                variables = converter({k: v.numpy() for k, v in sd.items()})
            else:
                warnings.warn(
                    f"{eval_backbone} weights not found (no-egress "
                    f"environment); using RANDOM weights — metric values are "
                    f"NOT comparable. Set STUDIOGAN_WEIGHTS_DIR.")
                self.random_weights = True
                variables = model.init(jax.random.PRNGKey(0),
                                       jnp.zeros((1, self.res, self.res, 3)))
            mean = jnp.asarray(self.mean)
            std = jnp.asarray(self.std)

            @jax.jit
            def forward(x):  # x: NHWC float in [0,255]
                x = (x / 255.0 - mean) / std
                return model.apply(variables, x)

            self._forward = forward
        elif eval_backbone == "Swin-T_torch":
            from studiogan_tpu.metrics.swin import SwinTransformer
            self.mean = np.array([0.485, 0.456, 0.406], np.float32)
            self.std = np.array([0.229, 0.224, 0.225], np.float32)
            model = SwinTransformer()
            path = _find_weights(("swin_base_patch4_window7_224_22kto1k.pth",))
            if path:
                raise NotImplementedError(
                    "Swin weight conversion lands with the weights drop")
            warnings.warn(
                "Swin weights not found (no-egress environment); using RANDOM "
                "weights — metric values are NOT comparable.")
            self.random_weights = True
            variables = model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, self.res, self.res, 3)))
            mean = jnp.asarray(self.mean)
            std = jnp.asarray(self.std)

            @jax.jit
            def forward(x):
                x = (x / 255.0 - mean) / std
                return model.apply(variables, x)

            self._forward = forward
        else:
            raise NotImplementedError(eval_backbone)

        self.resizer = resize_mod.build_resizer(post_resizer, eval_backbone,
                                                self.res)

    def get_outputs(self, x: np.ndarray, quantize: bool = False):
        """x: NHWC [-1,1] float (quantize=True) or uint8 (quantize=False).
        Returns (features, logits) as numpy (reference preparation.py:103-122)."""
        if quantize:
            x = resize_mod.quantize_images(x)
        else:
            x = np.asarray(x).astype(np.uint8)
        if self.post_resizer == "legacy":
            resized = self.resizer.batch(jnp.asarray(x, jnp.float32))
        else:  # PIL host path — the clean/friendly semantics
            resized = np.stack([self.resizer(im) for im in
                                x.astype(np.float32)])
        feats, logits = self._forward(jnp.asarray(resized))
        return np.asarray(feats), np.asarray(logits)


class Evaluator:
    """Facade: moments/features caching + in-training evaluation
    (reference preparation.py:125-213 + worker.evaluate)."""

    def __init__(self, cfg, rt=None, eval_dataset_kwargs: dict | None = None,
                 num_generate: int | None = None, nearest_k: int = 5):
        self.cfg = cfg
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
            batch_size=min(self.cfg.OPTIMIZATION.batch_size, 256))
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
        fake_feats, fake_probs, _ = feats_mod.generate_images_and_stack_features(
            engine, state, self.eval_model, self.num_generate,
            batch_size=min(self.cfg.OPTIMIZATION.batch_size, 256), rng=rng,
            override_g_state=override_g_state)
        out = {}
        if "fid" in metrics:
            out["fid"] = fid_mod.calculate_fid(self._mu, self._sigma, fake_feats)
        if "is" in metrics:
            is_score, is_std, _, _ = ins_mod.eval_features(fake_probs, None,
                                                           splits=splits)
            out["is"] = is_score
            out["is_std"] = is_std
        if "prdc" in metrics:
            out.update(prdc_mod.calculate_pr_dc(self._real_feats, fake_feats,
                                                self.nearest_k))
        return out
