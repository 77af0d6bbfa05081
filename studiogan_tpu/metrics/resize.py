"""Resizers for "clean/friendly metrics" (parity with reference
src/utils/resize.py, the clean-fid machinery).

The PIL float-per-channel path ('clean'/'friendly') is deliberately
host-side — it is the *semantics* of clean-FID, not a speed path
(SURVEY.md §3.2 note).  The 'legacy' path (torch bilinear,
align_corners=False) is reproduced on-device with jax.image.resize
(identical half-pixel sampling) so the common case never leaves the
TPU.
"""

from __future__ import annotations

import numpy as np

PIL_FILTERS = {"bicubic": "BICUBIC", "bilinear": "BILINEAR",
               "nearest": "NEAREST", "lanczos": "LANCZOS", "box": "BOX"}

FRIENDLY_FILTER = {  # reference resize.py:50-69
    "InceptionV3_tf": "bilinear",
    "InceptionV3_torch": "lanczos",
    "ResNet50_torch": "bilinear",
    "SwAV_torch": "bilinear",
    "DINO_torch": "bilinear",
    "Swin-T_torch": "bicubic",
}


def make_pil_resizer(filter_name: str, size: tuple[int, int]):
    """PIL 'F'-mode per-channel float resize (reference resize.py:72-82):
    no clipping, float32, channel-independent."""
    from PIL import Image
    flt = getattr(Image, PIL_FILTERS[filter_name])

    def resize_single_channel(x_np):
        img = Image.fromarray(x_np.astype(np.float32), mode="F")
        img = img.resize(size, resample=flt)
        return np.asarray(img)[..., None]

    def func(x):  # HWC uint8/float -> HWC float32
        return np.concatenate(
            [resize_single_channel(x[:, :, c]) for c in range(3)],
            axis=2).astype(np.float32)

    return func


def make_legacy_resizer(size: tuple[int, int]):
    """torch F.interpolate(bilinear, align_corners=False) == jax.image
    bilinear resize; runs batched on device."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def batch_resize(x):  # NHWC float
        out = jax.image.resize(x, (x.shape[0], size[0], size[1], x.shape[3]),
                               method="bilinear")
        return jnp.clip(out, 0.0, 255.0)

    def func(x):  # HWC -> HWC (single image, host API parity)
        return np.asarray(batch_resize(np.asarray(x, np.float32)[None]))[0]

    func.batch = batch_resize
    return func


def build_resizer(resizer: str, backbone: str, size: int):
    """reference resize.py:50-69"""
    if resizer == "friendly":
        return make_pil_resizer(FRIENDLY_FILTER[backbone], (size, size))
    if resizer == "clean":
        return make_pil_resizer("bicubic", (size, size))
    if resizer == "legacy":
        return make_legacy_resizer((size, size))
    raise ValueError(f"Invalid resizer {resizer}")


def quantize_images(x) -> np.ndarray:
    """[-1,1] NHWC float -> uint8 (reference ops.py:251-255)."""
    x = np.asarray(x, dtype=np.float32)
    x = (x + 1.0) / 2.0
    return np.clip(255.0 * x + 0.5, 0.0, 255.0).astype(np.uint8)
