"""Generator EMA (parity with reference src/utils/ema.py).

Functional over pytrees: p_ema <- p + decay * (p_ema - p) (torch lerp).
Buffers (BN stats / SN vectors) are copied, matching EmaStylegan2 and
Ema's num_batches_tracked handling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, decay):
    """p_ema = (1-decay)*p + decay*p_ema."""
    return jax.tree.map(lambda e, p: p + decay * (e - p), ema_params, params)


def vanilla_decay(step, decay: float, start_iter: int):
    """reference ema.py:27-32: copy until start_iter, then EMA."""
    return jnp.where(step < start_iter, 0.0, decay)


def stylegan_decay(step, batch_size: int, ema_kimg: float, ema_rampup):
    """reference ema.py:59-66: half-life in kimg with optional ramp-up."""
    ema_nimg = ema_kimg * 1000.0
    if ema_rampup != "N/A" and ema_rampup is not None:
        cur_nimg = batch_size * step.astype(jnp.float32)
        ema_nimg = jnp.minimum(ema_nimg, cur_nimg * ema_rampup)
    return 0.5 ** (batch_size / jnp.maximum(ema_nimg, 1e-8))
