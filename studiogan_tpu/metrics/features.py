"""Feature stacking (parity with reference src/metrics/features.py).

Under GSPMD the reference's GatherLayer all_gathers (features.py:61-64)
are unnecessary: generation + backbone forward run as one sharded
program and features land replicated on host.  With the legacy (on-device)
resizer the whole generate -> quantize -> resize -> backbone chain is ONE
jitted SPMD program over the mesh (``make_fused_extractor``) — no host
round-trip per batch, matching the reference's DDP feature extraction
capability (features.py:61-64) the TPU way.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def make_fused_extractor(engine, eval_model, batch_size: int, rt):
    """One jitted SPMD program: z/y sampling -> G (EMA weights) ->
    quantize -> legacy resize -> backbone forward, batch axis sharded over
    the mesh.  Requires eval_model.post_resizer == 'legacy' (the PIL
    clean/friendly resizers are host-side by design).

    ``override_g_state`` is a TRACED argument (not baked into the
    closure) so one compiled program serves every evaluation round."""

    def step(state, k, override_g_state):
        imgs, labs = engine.generate(
            state, k, batch_size,
            truncation_factor=engine.cfg.RUN.truncation_factor,
            override_g_state=override_g_state)
        imgs = jax.lax.with_sharding_constraint(imgs, rt.batch)
        # quantize_images semantics on device: uint8 cast == floor here
        x = jnp.floor(jnp.clip(255.0 * (imgs + 1.0) / 2.0 + 0.5, 0.0, 255.0))
        resized = eval_model.resizer.batch(x)
        feats, logits = eval_model._forward(resized)
        return feats, logits, labs

    return jax.jit(step,
                   in_shardings=(rt.replicated, rt.replicated, rt.replicated),
                   out_shardings=(rt.replicated,) * 3)


def _fused_extractor_cached(engine, eval_model, batch_size: int, rt,
                            has_override: bool):
    """One compiled extractor per (engine, mesh, batch, override-shape) —
    re-jitting per evaluation round leaked retired executables and paid a
    full recompile every eval.

    Entries hold weakrefs matched by referent IDENTITY, not ``id()``
    keys: a dead engine/runtime whose id is reused by a new object
    (CPython allocator reuse) must MISS, never silently serve a stale
    executable closed over the dead object's config.  Dead entries are
    pruned on each miss; the list stays tiny (one entry per live
    engine/mesh/batch combination)."""
    import weakref

    cache = getattr(eval_model, "_fused_cache", None)
    if cache is None:
        cache = eval_model._fused_cache = []
    for eng_ref, rt_ref, bs, ov, fn in cache:
        if (eng_ref() is engine and rt_ref() is rt
                and bs == batch_size and ov == has_override):
            return fn
    cache[:] = [e for e in cache if e[0]() is not None and e[1]() is not None]
    fn = make_fused_extractor(engine, eval_model, batch_size, rt)
    cache.append((weakref.ref(engine), weakref.ref(rt),
                  batch_size, has_override, fn))
    return fn


def generate_images_and_stack_features(engine, state, eval_model,
                                       num_generate: int, batch_size: int,
                                       rng, quantize: bool = True,
                                       override_g_state=None, rt=None):
    """reference features.py:17-65: loop G -> backbone, stack feats/probs."""
    feats, probs, labels = [], [], []
    n_batches = math.ceil(num_generate / batch_size)
    fused = None
    if (rt is not None and quantize
            and batch_size % rt.num_devices == 0
            and eval_model.post_resizer == "legacy"
            and not engine.cfg.RUN.langevin_sampling):
        fused = _fused_extractor_cached(engine, eval_model, batch_size, rt,
                                        override_g_state is not None)
    for i in range(n_batches):
        rng, k = jax.random.split(rng)
        if fused is not None:
            f, logit, labs = fused(state, k, override_g_state)
            f, logit = np.asarray(f), np.asarray(logit)
        else:
            imgs, labs = engine.generate(
                state, k, batch_size,
                truncation_factor=engine.cfg.RUN.truncation_factor,
                override_g_state=override_g_state)
            f, logit = eval_model.get_outputs(np.asarray(jax.device_get(imgs)),
                                              quantize=quantize)
        feats.append(f)
        probs.append(_softmax(logit))
        labels.append(np.asarray(jax.device_get(labs)))
    feats = np.concatenate(feats)[:num_generate]
    probs = np.concatenate(probs)[:num_generate]
    labels = np.concatenate(labels)[:num_generate]
    return feats, probs, labels


def sample_images_from_loader_and_stack_features(dataset, eval_model,
                                                 num_feats: int,
                                                 batch_size: int, rt=None):
    """reference features.py:68-104 / stack_features:107-142: real-data
    features straight from a dataset (uint8 HWC).

    With ``rt`` and the legacy resizer the resize+forward runs batch-
    sharded over the mesh (the reference's DDP evaluate path,
    evaluate.py:112-164, re-expressed as SPMD)."""
    feats, probs, labels = [], [], []
    n = min(num_feats, len(dataset))
    sharded = rt is not None and eval_model.post_resizer == "legacy"
    for start in range(0, n, batch_size):
        idx = range(start, min(start + batch_size, n))
        batch = np.stack([dataset[i][0] for i in idx])
        labs = np.asarray([dataset[i][1] for i in idx])
        if sharded:
            x = batch.astype(np.float32)
            pad = (-len(x)) % rt.num_devices
            if pad:
                x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
            xg = jax.device_put(x, rt.batch)
            resized = eval_model.resizer.batch(xg)
            f, logit = eval_model._forward(resized)
            f = np.asarray(f)[:len(batch)]
            logit = np.asarray(logit)[:len(batch)]
        else:
            f, logit = eval_model.get_outputs(batch, quantize=False)
        feats.append(f)
        probs.append(_softmax(logit))
        labels.append(labs)
    return np.concatenate(feats), np.concatenate(probs), np.concatenate(labels)


def _softmax(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    x = x - x.max(axis=1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=1, keepdims=True)
