"""Optimizer construction (parity with reference src/config.py:497-565).

torch-Adam semantics: L2 weight decay is added to the gradient BEFORE
the moment updates (not decoupled), eps inside sqrt denominator
differs from optax's default placement — we use optax.scale_by_adam
with matching eps and torch ordering.
"""

from __future__ import annotations

import optax

NA = "N/A"


def _base_tx(OPT, lr: float, betas, wd: float) -> optax.GradientTransformation:
    parts = []
    if wd and wd > 0:
        parts.append(optax.add_decayed_weights(wd))  # torch: grad += wd * p
    if OPT.type_ == "SGD":
        if OPT.momentum not in (NA, 0, None):
            parts.append(optax.trace(decay=OPT.momentum,
                                     nesterov=bool(OPT.nesterov not in (NA, False))))
    elif OPT.type_ == "RMSprop":
        parts.append(optax.scale_by_rms(decay=OPT.alpha, eps=1e-8))
        if OPT.momentum not in (NA, 0, None):
            parts.append(optax.trace(decay=OPT.momentum))
    elif OPT.type_ == "Adam":
        parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=OPT.adam_eps))
    else:
        raise NotImplementedError(OPT.type_)
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)


def build_g_optimizer(cfg) -> optax.GradientTransformation:
    OPT = cfg.OPTIMIZATION
    return _base_tx(OPT, OPT.g_lr, OPT.g_betas, OPT.g_weight_decay)


def _freeze_except(tx, keep_fn):
    """Apply ``tx`` only where keep_fn(path) is True; zero elsewhere.
    (optax.masked is NOT suitable: it passes masked-out grads through.)"""
    import jax

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: "train" if keep_fn(p) else "freeze", params)

    return optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()},
                                 label_fn)


def build_d_optimizer(cfg) -> optax.GradientTransformation:
    OPT = cfg.OPTIMIZATION
    tx = _base_tx(OPT, OPT.d_lr, OPT.d_betas, OPT.d_weight_decay)
    is_info = cfg.MODEL.info_type in ("discrete", "continuous", "both")
    freeze_blocks = (tuple(f"block{i}" for i in range(cfg.RUN.freezeD))
                     if cfg.RUN.freezeD > 0
                     and cfg.MODEL.backbone not in ("stylegan2", "stylegan3")
                     else ())

    if not is_info and not freeze_blocks:
        return tx

    def keep(path):
        # InfoGAN Q-heads are owned by the G optimizer
        # (reference config.py:500-521); freezeD freezes the first N trunk
        # blocks (reference misc.py:192-216)
        if is_info and _is_info_path(path):
            return False
        for k in path:
            key = str(getattr(k, "key", ""))
            if key.split("_")[0] in freeze_blocks or key in freeze_blocks:
                return False
        return True

    return _freeze_except(tx, keep)


def build_info_optimizer(cfg) -> optax.GradientTransformation:
    """G-lr optimizer over the Q-heads living inside D params."""
    OPT = cfg.OPTIMIZATION
    tx = _base_tx(OPT, OPT.g_lr, OPT.g_betas, OPT.g_weight_decay)
    return _freeze_except(tx, _is_info_path)


def _is_info_path(path) -> bool:
    return any(getattr(k, "key", None) is not None
               and str(getattr(k, "key")).startswith(("info_discrete", "info_conti"))
               for k in path)


def is_info_path(path: tuple) -> bool:
    return any(isinstance(k, str) and k.startswith(("info_discrete", "info_conti"))
               for k in path)


