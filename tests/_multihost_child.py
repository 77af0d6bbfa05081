"""Child process for tests/test_multihost.py — NOT a test module.

Joins a 2-process jax.distributed CPU cluster (2 local devices each, 4
global), exercises the real multi-host code paths (mesh.setup_runtime,
put_basket's make_array_from_process_local_data branch, BasketLoader's
DistributedSampler shard) and one full SPMD train step, then dumps a
JSON fingerprint for the parent to cross-check.
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # defeat any site customization

import numpy as np  # noqa: E402


def main():
    pid, nproc, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from studiogan_tpu.data.datasets import Dataset_
    from studiogan_tpu.data.pipeline import BasketLoader
    from studiogan_tpu.parallel.mesh import put_basket, setup_runtime

    rt = setup_runtime(total_nodes=nproc, current_node=pid,
                       coordinator=f"localhost:{port}")
    assert rt.process_count == nproc, rt
    assert rt.num_devices == 2 * nproc, rt.mesh
    assert jax.devices()[0].platform == "cpu", jax.devices()

    # --- DistributedSampler semantics: per-process shard ------------------
    ds = Dataset_("SYNTHETIC", None, train=True, synthetic_size=64,
                  num_classes=10, img_size=32)
    loader = BasketLoader(ds, batch_size=rt.local_batch(8),
                          basket_multiplier=2, random_flip=False, seed=7,
                          process_index=rt.process_index,
                          process_count=rt.process_count)
    loader._reshuffle()
    shard = [int(i) for i in loader._order]

    # basket assembly produces local-batch shapes
    x, lab = loader._make_basket()
    assert x.shape == (2, rt.local_batch(8), 32, 32, 3), x.shape

    # --- one SPMD train step over the global mesh --------------------------
    sys.path.insert(0, repo)
    from __graft_entry__ import _biggan_cfg
    from studiogan_tpu.models import build_discriminator, build_generator
    from studiogan_tpu.train import TrainEngine

    cfg = _biggan_cfg(g_conv_dim=8, d_conv_dim=8, batch_size=8,
                      d_updates=2, acml=1)
    G, D = build_generator(cfg), build_discriminator(cfg)
    eng = TrainEngine(cfg, G, D)
    state = eng.init_state(jax.random.PRNGKey(0))
    state = jax.device_put(state, rt.replicated)

    # deterministic global basket, local slice for this process
    imgs = np.load(os.path.join(workdir, "imgs.npy"))
    labels = np.load(os.path.join(workdir, "labels.npy"))
    lo, hi = pid * 4, (pid + 1) * 4
    gi, gl = put_basket(rt, imgs[:, lo:hi], labels[:, lo:hi])
    assert gi.shape == (2, 8, 32, 32, 3), gi.shape  # global view assembled

    step = jax.jit(eng.train_step,
                   in_shardings=(rt.replicated, rt.basket, rt.basket),
                   out_shardings=(rt.replicated, rt.replicated))
    # AOT-compile BEFORE the first collective: Gloo's context init has a
    # fixed ~30s window, but compile time skews by minutes between the
    # children under a contended full-suite run.  Compiling is purely
    # local; a file barrier then aligns both processes to enter the Gloo
    # ring together.
    compiled = step.lower(state, gi, gl).compile()
    with open(os.path.join(workdir, f"compiled{pid}"), "w") as f:
        f.write("ok")
    import time
    deadline = time.time() + 1800
    while not all(os.path.exists(os.path.join(workdir, f"compiled{p}"))
                  for p in range(nproc)):
        if time.time() > deadline:
            raise TimeoutError("peer never finished compiling")
        time.sleep(0.2)
    state, metrics = compiled(state, gi, gl)

    fp_g = sum(float(np.abs(np.asarray(p)).sum())
               for p in jax.tree.leaves(jax.device_get(state.g_params)))
    fp_d = sum(float(np.abs(np.asarray(p)).sum())
               for p in jax.tree.leaves(jax.device_get(state.d_params)))
    out = {"pid": pid, "ds_len": len(ds), "shard": shard,
           "fp_g": fp_g, "fp_d": fp_d,
           "d_loss": float(metrics["d_loss"]),
           "g_loss": float(metrics["g_loss"]),
           "step": int(state.step)}
    with open(os.path.join(workdir, f"out{pid}.json"), "w") as f:
        json.dump(out, f)
    print(f"child {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
