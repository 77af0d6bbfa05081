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


def build_d_optimizer(cfg) -> optax.GradientTransformation:
    OPT = cfg.OPTIMIZATION
    tx = _base_tx(OPT, OPT.d_lr, OPT.d_betas, OPT.d_weight_decay)
    if cfg.MODEL.info_type in ("discrete", "continuous", "both"):
        # InfoGAN Q-heads are owned by the G optimizer
        # (reference config.py:500-521): mask them out of D updates.
        tx = optax.masked(tx, lambda params: _mask_info(params, invert=True))
    return tx


def build_info_optimizer(cfg) -> optax.GradientTransformation:
    """G-lr optimizer over the Q-heads living inside D params."""
    OPT = cfg.OPTIMIZATION
    tx = _base_tx(OPT, OPT.g_lr, OPT.g_betas, OPT.g_weight_decay)
    return optax.masked(tx, lambda params: _mask_info(params, invert=False))


def is_info_path(path: tuple) -> bool:
    return any(isinstance(k, str) and k.startswith(("info_discrete", "info_conti"))
               for k in path)


def _mask_info(params, invert: bool):
    import jax
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def mask_fn(path, _):
        hit = any(
            getattr(k, "key", None) is not None
            and str(getattr(k, "key")).startswith(("info_discrete", "info_conti"))
            for k in path)
        return (not hit) if invert else hit

    return jax.tree_util.tree_map_with_path(mask_fn, params)
