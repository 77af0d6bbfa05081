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
import shutil
import threading
from typing import Any

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.PyTreeCheckpointer()


_pending: list[threading.Thread] = []
_async_errors: list[BaseException] = []


def wait_for_pending_saves() -> None:
    """Join any in-flight async checkpoint writes (call before exit /
    before loading what might still be writing).  Re-raises any error the
    background writer hit (disk full, orbax serialization failure) —
    training must not continue believing checkpoints exist."""
    while _pending:
        _pending.pop().join()
    if _async_errors:
        err = _async_errors[:]
        _async_errors.clear()
        raise RuntimeError(
            f"async checkpoint write(s) failed: {err!r}") from err[0]


def _write_guarded(*args) -> None:
    try:
        _write(*args)
    except BaseException as e:  # noqa: BLE001 — propagated via wait_for_…
        _async_errors.append(e)


def _write(path: str, host_state, metadata, ckpt_dir: str, when: str,
           step: int) -> None:
    # write into a tmp dir, then atomically rename: a crash mid-write
    # never corrupts the 'current' snapshot
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    _ckptr().save(tmp, host_state, force=True)
    shutil.rmtree(path, ignore_errors=True)
    os.replace(tmp, path)
    if metadata is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(metadata, f, indent=2, default=str)
    # prune older snapshots of the same kind (reference keeps one
    # 'current' + one 'best', worker.py:965-978)
    prefix = f"model={when}-weights-step="
    for name in os.listdir(ckpt_dir):
        # skip metadata and any in-progress tmp dirs (ours and orbax's
        # own '*.orbax-checkpoint-tmp' staging siblings)
        if name.startswith(prefix) and name[len(prefix):].isdigit():
            other = int(name[len(prefix):])
            if other != step:
                shutil.rmtree(os.path.join(ckpt_dir, name),
                              ignore_errors=True)
                meta = os.path.join(ckpt_dir, name + ".meta.json")
                if os.path.exists(meta):
                    os.remove(meta)


def save_ckpt(ckpt_dir: str, state, metadata: dict | None = None,
              when: str = "current", async_save: bool = False) -> str:
    """Write SAVE_DIR/checkpoints/{run}/model={when}-weights-step={n}.

    async_save: snapshot the state ON DEVICE (cheap HBM copy) and run the
    device->host fetch + file write on a background thread, so training
    resumes immediately — on a tunneled chip the synchronous fetch of an
    ImageNet-scale state costs ~2 minutes.  The write is atomic
    (tmp dir + rename); wait_for_pending_saves() joins stragglers."""
    step = int(state.step)
    path = os.path.abspath(
        os.path.join(ckpt_dir, f"model={when}-weights-step={step}"))
    if async_save:
        wait_for_pending_saves()  # one writer at a time, bounded memory
        snap = jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)
        t = threading.Thread(
            target=lambda: _write_guarded(path, jax.device_get(snap),
                                          metadata, ckpt_dir, when, step),
            daemon=True)
        t.start()
        _pending.append(t)
    else:
        _write(path, jax.device_get(state), metadata, ckpt_dir, when, step)
    return path


def find_ckpt(ckpt_dir: str, load_best: bool = False) -> str | None:
    """reference ckpt.py:77-99: glob by prefix, pick best or latest.

    Only fully-written snapshots qualify: a crash mid async/sync save
    leaves '…-step=N.tmp' or orbax '*-tmp-*' staging dirs behind, which
    must never break resume — they're swept here and skipped by the
    isdigit guard (same filter as the prune loop in _write)."""
    if not os.path.isdir(ckpt_dir):
        return None
    when = "best" if load_best else "current"
    prefix = f"model={when}-weights-step="
    cands = []
    for name in os.listdir(ckpt_dir):
        if name.endswith(".tmp") or "orbax-checkpoint-tmp" in name:
            shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)
            continue
        if name.startswith(prefix) and name[len(prefix):].isdigit():
            cands.append((int(name[len(prefix):]), name))
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
