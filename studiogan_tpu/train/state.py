"""The training state pytree.

Everything the reference keeps as scattered mutable state — module
buffers, optimizer objects, and the run metadata it stuffs into the
D checkpoint (seed/step/topk/ada_p/best_fid/lecam_emas,
reference src/worker.py:947-960) — is one explicit, checkpointable,
donate-able pytree.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class GANTrainState:
    step: Array                    # int32 global step
    rng: Array                     # PRNGKey threaded through training
    g_params: Any
    g_state: Any                   # {'batch_stats': ..., 'sn': ...}
    d_params: Any
    d_state: Any
    g_opt: Any
    d_opt: Any
    g_ema_params: Any = None
    g_ema_state: Any = None
    # scalar training-dynamics state (reference worker.__init__:119-135)
    topk: Array = struct.field(default_factory=lambda: jnp.asarray(1.0))
    ada_p: Array = struct.field(default_factory=lambda: jnp.asarray(0.0))
    # ADA/APA heuristic accumulators: [sum(sign(real logits)), count]
    ada_stats: Array = struct.field(default_factory=lambda: jnp.zeros((2,)))
    lecam: Any = None              # {'D_real': ..., 'D_fake': ...} or None
    pl_mean: Array = struct.field(default_factory=lambda: jnp.asarray(0.0))
    # optimizer state for InfoGAN Q-heads (updated in the G step)
    info_opt: Any = None

    @property
    def ema_or_g_params(self):
        return self.g_params if self.g_ema_params is None else self.g_ema_params

    @property
    def ema_or_g_state(self):
        return self.g_state if self.g_ema_params is None else self.g_ema_state


def init_lecam() -> dict:
    """LeCam EMA init=7777 matches reference ops.py:106-113."""
    return {k: jnp.asarray(7777.0) for k in
            ("G_loss", "D_loss_real", "D_loss_fake", "D_real", "D_fake")}
