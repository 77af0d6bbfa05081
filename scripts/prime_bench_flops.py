"""Prime bench_flops.json with exact unrolled-scan FLOPs counts.

Run ONCE on the chip (or any backend — the count is a property of the
HLO, sanity-checked below against the looped lowering) so that a cold
driver ``bench.py`` run never pays the expensive unrolled count-only
compile (round-3 postmortem: that compile ate the whole 960s budget).

XLA's ``cost_analysis`` counts a ``lax.scan``/while body ONCE
regardless of trip count, so the exact per-step count needs the
du/acml scans fully unrolled (CLAUDE.md round-2 finding).

Usage:  python scripts/prime_bench_flops.py [--mpc]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

_SIDECAR = os.path.join(_REPO, "bench_flops.json")


def _flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def _count(cfg, unroll: bool) -> float:
    from studiogan_tpu.models import build_discriminator, build_generator
    from studiogan_tpu.train import TrainEngine

    G, D = build_generator(cfg), build_discriminator(cfg)
    eng = TrainEngine(cfg, G, D, unroll_scans=unroll)
    state = eng.init_state(jax.random.PRNGKey(0))
    n_micro = (cfg.OPTIMIZATION.d_updates_per_step
               * cfg.OPTIMIZATION.acml_steps)
    sz = cfg.DATA.img_size
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(
        rng.uniform(-1, 1, (n_micro, cfg.OPTIMIZATION.batch_size, sz, sz, 3)),
        jnp.float32)
    labels = jnp.asarray(
        rng.randint(0, cfg.DATA.num_classes,
                    (n_micro, cfg.OPTIMIZATION.batch_size)), jnp.int32)
    t0 = time.time()
    compiled = jax.jit(eng.train_step).lower(state, imgs, labels).compile()
    f = _flops(compiled)
    print(f"  {'unrolled' if unroll else 'looped  '}: {f/1e12:.3f} TF/step "
          f"(compile {time.time()-t0:.0f}s)", flush=True)
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mpc", action="store_true",
                    help="also prime the bf16 (mixed-precision) variant")
    args = ap.parse_args()

    from __graft_entry__ import _biggan_cfg

    try:
        cache = json.load(open(_SIDECAR))
    except Exception:
        cache = {}

    variants = [False] + ([True] if args.mpc else [])
    for mpc in variants:
        key = f"cifar_biggan_bs64_du5_unrolled_mpc{int(mpc)}"
        if key in cache:
            print(f"{key}: already primed ({cache[key]/1e12:.3f} TF)")
            continue
        cfg = _biggan_cfg()
        cfg.RUN.mixed_precision = mpc
        print(f"{key}: counting on {jax.devices()[0].platform} ...",
              flush=True)
        looped = _count(cfg, unroll=False)
        unrolled = _count(cfg, unroll=True)
        # sanity: unrolled must exceed looped (scan bodies now counted
        # per-trip) and be < n_micro+1 times it
        assert unrolled > looped, (unrolled, looped)
        cache[key] = unrolled
        cache[key.replace("_unrolled_", "_looped_")] = looped
        tmp = _SIDECAR + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
        os.replace(tmp, _SIDECAR)
        print(f"{key}: saved {unrolled/1e12:.3f} TF/step")


if __name__ == "__main__":
    main()
