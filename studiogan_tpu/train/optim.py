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


def freezeD_frozen_modules(top_level_names, num_freeze: int,
                           backbone: str) -> set:
    """Reproduce the reference's flat D blocklist numbering
    (misc.py:192-216 freezes params matching ``blocks.{i}`` for
    i < num_freeze): every trunk block is one list entry, every
    SelfAttention gets its OWN entry right after the block it follows
    (big_resnet.py:307-344), and the deep variants give every depth
    sub-block its own entry (big_resnet_deep_legacy.py:273-285).

    Our flax modules are named ``block{i}`` (+ optional ``_suffix`` for
    sub-modules) and ``attn{i}``; this maps the reference indices onto
    those names given the actual top-level param keys.
    """
    import re
    deep = backbone in ("big_resnet_deep_legacy", "big_resnet_deep_studiogan")
    stages = sorted({int(m.group(1)) for k in top_level_names
                     for m in [re.match(r"(?:block|attn)(\d+)", k)] if m})
    entries: list[set] = []  # flat blocklist: each entry = set of key names
    for i in stages:
        block_keys = sorted(k for k in top_level_names
                            if re.match(rf"block{i}(_|$)", k))
        if deep:
            # block{i}_{j}: one entry per depth sub-block j
            by_sub: dict = {}
            for k in block_keys:
                sub = k.split("_", 1)[1] if "_" in k else ""
                by_sub.setdefault(sub, set()).add(k)
            for sub in sorted(by_sub, key=lambda s: (len(s), s)):
                entries.append(by_sub[sub])
        elif block_keys:
            entries.append(set(block_keys))  # one entry per stage
        if f"attn{i}" in top_level_names:
            entries.append({f"attn{i}"})
    frozen: set = set()
    for e in entries[:num_freeze]:
        frozen |= e
    return frozen


def build_d_optimizer(cfg) -> optax.GradientTransformation:
    OPT = cfg.OPTIMIZATION
    tx = _base_tx(OPT, OPT.d_lr, OPT.d_betas, OPT.d_weight_decay)
    is_info = cfg.MODEL.info_type in ("discrete", "continuous", "both")
    n_freeze = (cfg.RUN.freezeD
                if cfg.RUN.freezeD > 0
                and cfg.MODEL.backbone not in ("stylegan2", "stylegan3")
                else 0)

    if not is_info and not n_freeze:
        return tx

    backbone = cfg.MODEL.backbone

    def label_fn(params):
        import jax
        frozen = (freezeD_frozen_modules(set(params.keys()), n_freeze,
                                         backbone) if n_freeze else set())

        def label(path, _):
            # InfoGAN Q-heads are owned by the G optimizer
            # (reference config.py:500-521)
            if is_info and _is_info_path(path):
                return "freeze"
            top = str(getattr(path[0], "key", path[0]))
            return "freeze" if top in frozen else "train"

        return jax.tree_util.tree_map_with_path(label, params)

    return optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()},
                                 label_fn)


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


