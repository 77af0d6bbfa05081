"""Differentiable augmentation modules (parity with reference
src/utils/{diffaug,cr,simclr_aug,ada_aug,apa_aug}.py + the selection
logic of config.py:567-628).

Interface: every augment is ``fn(rng, x, p) -> x`` with x NHWC in
[-1, 1]; ``p`` is the ADA/APA probability (ignored by fixed augments).
"""

from __future__ import annotations

from studiogan_tpu.aug.diffaug import apply_diffaug  # noqa: F401
from studiogan_tpu.aug.cr import apply_cr_aug  # noqa: F401
from studiogan_tpu.aug.apa_aug import apply_apa_aug  # noqa: F401

ADA_TYPES = ("blit", "geom", "color", "filter", "noise", "cutout",
             "bg", "bgc", "bgcf", "bgcfn", "bgcfnc")
SIMCLR_TYPES = ("simclr_basic", "simclr_hq", "simclr_hq_cutout", "byol")


def identity(rng, x, p=None):
    return x


def _named_augment(name: str):
    if name == "cr":
        return lambda rng, x, p=None: apply_cr_aug(rng, x)
    if name == "diffaug":
        return lambda rng, x, p=None: apply_diffaug(rng, x)
    if name in SIMCLR_TYPES:
        from studiogan_tpu.aug.simclr_aug import SimclrAugment
        aug = SimclrAugment(aug_type=name)
        return lambda rng, x, p=None: aug(rng, x)
    if name in ADA_TYPES:
        from studiogan_tpu.aug.ada_aug import AdaAugment
        aug = AdaAugment.from_preset(name)
        return lambda rng, x, p=None: aug(rng, x, 1.0 if p is None else p)
    raise NotImplementedError(f"augment {name!r}")


def build_augments(cfg):
    """Returns (series_augment, parallel_augment) per reference
    config.py:567-628.  series: applied to real&fake in the D pass and
    fake in the G pass; parallel: the CR/bCR pair augment."""
    series = identity
    parallel = identity
    A, L = cfg.AUG, cfg.LOSS
    if A.apply_diffaug:
        fn = _named_augment(A.diffaug_type)
        if A.diffaug_type in ADA_TYPES:  # fixed p=1.0 (config.py:594-596)
            series = lambda rng, x, p=None: fn(rng, x, 1.0)  # noqa: E731
        else:
            series = fn
    if A.apply_ada:
        series = _named_augment(A.ada_aug_type)  # p comes from state
    if L.apply_cr:
        fn = _named_augment(A.cr_aug_type)
        parallel = (lambda rng, x, p=None: fn(rng, x, 1.0)) \
            if A.cr_aug_type in ADA_TYPES else fn
    if L.apply_bcr:
        fn = _named_augment("cr" if A.bcr_aug_type == "bcr" else A.bcr_aug_type)
        parallel = (lambda rng, x, p=None: fn(rng, x, 1.0)) \
            if A.bcr_aug_type in ADA_TYPES else fn
    return series, parallel
