"""Checkpoint / resume (parity with reference src/utils/ckpt.py +
worker.save, worker.py:940-983).

The reference writes three .pth files (G, D, G_ema) with run metadata
packed into D's file.  Here the entire GANTrainState (params, opt
states, EMA, RNG, step, topk, ada_p, LeCam EMAs) is one orbax pytree —
resume restores training bit-exactly.  "current" and "best" snapshots
mirror the reference's naming.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.PyTreeCheckpointer()


def save_ckpt(ckpt_dir: str, state, metadata: dict | None = None,
              when: str = "current") -> str:
    """Write SAVE_DIR/checkpoints/{run}/model={when}-weights-step={n}."""
    step = int(state.step)
    path = os.path.abspath(os.path.join(ckpt_dir, f"model={when}-weights-step={step}"))
    _ckptr().save(path, jax.device_get(state), force=True)
    if metadata is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(metadata, f, indent=2, default=str)
    # prune older snapshots of the same kind (reference keeps one
    # 'current' + one 'best', worker.py:965-978)
    prefix = f"model={when}-weights-step="
    for name in os.listdir(ckpt_dir):
        if name.startswith(prefix) and not name.endswith(".meta.json"):
            other = int(name[len(prefix):])
            if other != step:
                import shutil
                shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)
                meta = os.path.join(ckpt_dir, name + ".meta.json")
                if os.path.exists(meta):
                    os.remove(meta)
    return path


def find_ckpt(ckpt_dir: str, load_best: bool = False) -> str | None:
    """reference ckpt.py:77-99: glob by prefix, pick best or latest."""
    if not os.path.isdir(ckpt_dir):
        return None
    when = "best" if load_best else "current"
    cands = []
    for name in os.listdir(ckpt_dir):
        if name.startswith(f"model={when}-weights-step=") \
                and not name.endswith(".meta.json"):
            cands.append((int(name.split("step=")[1]), name))
    if not cands:
        return None
    return os.path.join(ckpt_dir, max(cands)[1])


def load_ckpt(path: str, target_state) -> tuple[Any, dict]:
    """Restore a GANTrainState (structure from target_state) + metadata."""
    state = _ckptr().restore(os.path.abspath(path), item=jax.device_get(target_state))
    meta = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return state, meta
