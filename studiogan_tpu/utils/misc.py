"""Engine-adjacent utilities (parity subset of reference src/utils/misc.py)."""

from __future__ import annotations

import os
import random
from datetime import timedelta
from time import time

import numpy as np


def machine_fingerprint() -> str:
    """Short hash of this host's CPU feature flags.  XLA:CPU persists
    AOT executables specialized to the compiling host; loading them on a
    different machine warns (and can SIGILL), so CPU compile caches must
    be keyed per machine.  TPU executables are host-independent."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            sig = next(ln for ln in f if ln.startswith("flags"))
    except Exception:
        import platform
        sig = platform.processor() or platform.machine() or "unknown"
    return hashlib.sha1(sig.encode()).hexdigest()[:10]


def enable_persistent_compile_cache(root: str | None = None) -> str:
    """Point jax's persistent compilation cache at the repo-level
    ``.jax_cache``: TPU executables go to the shared (committable)
    ``tpu`` subdir, CPU executables to a per-machine subdir (see
    machine_fingerprint).  Safe to call after backend init — the cache
    dir is consulted at compile time.  Returns the chosen dir.

    An explicit JAX_COMPILATION_CACHE_DIR env var wins (tests and the
    verify recipe pin their own cache)."""
    import jax
    env_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env_dir:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return env_dir
    if root is None:
        import studiogan_tpu
        root = os.environ.get("STUDIOGAN_CACHE_ROOT") or os.path.dirname(
            os.path.dirname(os.path.abspath(studiogan_tpu.__file__)))
    plat = jax.devices()[0].platform
    tag = f"cpu-{machine_fingerprint()}" if plat == "cpu" else "tpu"
    d = os.path.join(root, ".jax_cache", tag)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return d


def fix_seed(seed: int) -> int:
    """reference misc.py:158-164; JAX randomness is all explicit keys, so
    only python/numpy global RNGs need pinning (data pipeline)."""
    if seed < 0:
        seed = random.randint(1, 4096)
    random.seed(seed)
    np.random.seed(seed)
    return seed


def elapsed_time(start_time: float) -> str:
    """reference misc.py:270-273"""
    return str(timedelta(seconds=round(time() - start_time)))


def prepare_folder(names, save_dir: str) -> None:
    """reference misc.py:144-149"""
    for name in names:
        os.makedirs(os.path.join(save_dir, name), exist_ok=True)


def to_uint8(images: np.ndarray) -> np.ndarray:
    """[-1,1] float NHWC -> uint8 (reference ops.py:251 quantize_images:
    (x+1)*127.5 + 0.5 clamped)."""
    x = (np.asarray(images, dtype=np.float32) + 1.0) * 127.5
    return np.clip(x + 0.5, 0, 255).astype(np.uint8)


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8,
                    padding: int = 2) -> None:
    """Canvas of NHWC [-1,1] images (reference misc.py:419-480 plotting)."""
    from PIL import Image

    imgs = to_uint8(images)
    n, h, w, c = imgs.shape
    ncol = (n + nrow - 1) // nrow
    canvas = np.zeros((ncol * (h + padding) + padding,
                       nrow * (w + padding) + padding, c), dtype=np.uint8)
    for i in range(n):
        r, col = divmod(i, nrow)
        y0 = r * (h + padding) + padding
        x0 = col * (w + padding) + padding
        canvas[y0:y0 + h, x0:x0 + w] = imgs[i]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(canvas.squeeze()).save(path)


def save_images_png(images: np.ndarray, labels, save_dir: str,
                    is_generate: bool = True) -> None:
    """reference misc.py:482-512: per-image PNGs under
    {save_dir}/{fake|real}_images/{label}/..."""
    from PIL import Image

    kind = "fake" if is_generate else "real"
    imgs = to_uint8(images)
    for i, img in enumerate(imgs):
        d = os.path.join(save_dir, f"{kind}_images", str(int(labels[i])))
        os.makedirs(d, exist_ok=True)
        Image.fromarray(img).save(os.path.join(d, f"{kind}_{i}.png"))
