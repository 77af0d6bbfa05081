"""END-TO-END FID value parity vs the reference torch pipeline.

The same (deterministic random) DINO ViT-S/8 state dict is loaded into

  * the REFERENCE pipeline — its own modules imported from the read-only
    mount (metrics/vit.py vit_small + utils/resize.py build_resizer +
    the quantize/resize glue of utils/ops.py:251-263 /
    preparation.py:70-75,103-122), run on torch CPU; and
  * OUR pipeline — LoadEvalModel("DINO_torch") fed the state dict
    through the real STUDIOGAN_WEIGHTS_DIR file-drop path
    (dino_deitsmall8_pretrain.pth + linearweights),

then both run the full quantize -> resize -> normalize -> backbone ->
moments -> sqrtm chain over the same two image sets.  This proves the
whole metric stack end to end, not just the backbone forward
(test_eval_backbones covers that per-backbone).  DINO is the backbone
because it is the one reference eval model that is pure torch — the
others need torchvision/timm, absent in this environment;
scripts/verify_backbone_parity.py runs the equivalent check for all six
the day real weights (and torchvision) are available.

Weights are deterministic random: torch.manual_seed + default module
init — no downloads (no egress).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference mount not available")
torch = pytest.importorskip("torch")


def _load_ref(name: str, relpath: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _reference_features(model, images, resizer, mean, std):
    """The reference host path: quantize (ops.py:251-255) -> legacy
    resize + ToTensor semantics + normalize (ops.py:258-263) -> DINO
    forward returning (embed, logits) (preparation.py:110-111,
    vit.py:220-224).  torchvision is absent, so ToTensor's HWC->CHW
    float conversion is done directly (it does not rescale float
    input)."""
    x = (torch.as_tensor(images).permute(0, 3, 1, 2) + 1) / 2
    x = (255.0 * x + 0.5).clamp(0.0, 255.0)
    x = x.numpy().astype(np.uint8)
    x = x.transpose((0, 2, 3, 1))
    resized = np.stack([resizer(im) for im in x])      # float32 HWC
    xt = torch.as_tensor(resized).permute(0, 3, 1, 2)
    mean = torch.tensor(mean).view(1, 3, 1, 1)
    std = torch.tensor(std).view(1, 3, 1, 1)
    xt = (xt / 255.0 - mean) / std
    with torch.no_grad():
        feats, logits = model(xt.float())
    return feats.numpy(), logits.numpy()


def _frechet(mu1, s1, mu2, s2, eps=1e-6):
    """Textbook Frechet distance (same math as reference fid.py:34-60)."""
    from scipy import linalg
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(s1.dot(s2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(s1.shape[0]) * eps
        covmean = linalg.sqrtm((s1 + offset).dot(s2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(s1) + np.trace(s2)
                 - 2 * np.trace(covmean))


@pytest.fixture(scope="module")
def parity_setup(tmp_path_factory):
    vits = _load_ref("ref_vit", "metrics/vit.py")
    torch.manual_seed(0)
    model = vits.vit_small(patch_size=8, num_classes=1000, num_last_blocks=4)
    model.eval()

    wdir = tmp_path_factory.mktemp("weights")
    torch.save({"teacher": {k: v.detach().clone()
                            for k, v in model.state_dict().items()}},
               wdir / "dino_deitsmall8_pretrain.pth")
    torch.save({"state_dict": {
        "module.linear.weight": model.linear.weight.detach().clone(),
        "module.linear.bias": model.linear.bias.detach().clone()}},
               wdir / "dino_deitsmall8_linearweights.pth")

    old = os.environ.get("STUDIOGAN_WEIGHTS_DIR")
    os.environ["STUDIOGAN_WEIGHTS_DIR"] = str(wdir)
    try:
        from studiogan_tpu.metrics.preparation import LoadEvalModel
        ours = LoadEvalModel("DINO_torch", "legacy")
    finally:
        if old is None:
            os.environ.pop("STUDIOGAN_WEIGHTS_DIR")
        else:
            os.environ["STUDIOGAN_WEIGHTS_DIR"] = old
    assert not ours.random_weights, "converter did not pick up the .pth"

    ref_resize = _load_ref("ref_resize", "utils/resize.py")
    resizer = ref_resize.build_resizer("legacy", "DINO_torch", 224)
    return model, ours, resizer


def _images(seed, n=12, size=64):
    rng = np.random.RandomState(seed)
    base = rng.uniform(-1, 1, (n, size, size, 3)).astype(np.float32)
    # low-frequency structure so features differ meaningfully per set
    yy = np.linspace(-1, 1, size, dtype=np.float32)
    base += 0.5 * np.sin(3 * yy + seed)[None, :, None, None]
    return np.clip(base, -1, 1)


class TestFIDValueParity:
    def test_features_and_fid_match_reference_pipeline(self, parity_setup):
        model, ours, resizer = parity_setup
        set_a, set_b = _images(1), _images(2)

        ref_fa, _ = _reference_features(model, set_a, resizer,
                                        ours.mean, ours.std)
        ref_fb, _ = _reference_features(model, set_b, resizer,
                                        ours.mean, ours.std)
        our_fa, _ = ours.get_outputs(set_a, quantize=True)
        our_fb, _ = ours.get_outputs(set_b, quantize=True)

        # backbone+preprocessing parity (fp32 CPU both sides)
        scale = np.abs(ref_fa).max()
        assert np.abs(our_fa - ref_fa).max() <= 2e-3 * max(scale, 1.0)

        from studiogan_tpu.metrics import fid as fid_mod
        mu_ra, s_ra = fid_mod.compute_moments(ref_fa)
        mu_rb, s_rb = fid_mod.compute_moments(ref_fb)
        fid_ref = _frechet(mu_ra, s_ra, mu_rb, s_rb)
        mu_oa, s_oa = fid_mod.compute_moments(our_fa)
        mu_ob, s_ob = fid_mod.compute_moments(our_fb)
        fid_ours = fid_mod.frechet_inception_distance(mu_oa, s_oa, mu_ob, s_ob)

        assert fid_ref > 0
        assert abs(fid_ours - fid_ref) / fid_ref < 1e-3, (fid_ours, fid_ref)
