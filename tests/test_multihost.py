"""Multi-host (multi-process) coverage: a real 2-process jax.distributed
CPU cluster (reference semantics: DDP/MDDP launcher, src/main.py:175-196 +
DistributedSampler, src/loader.py:161-176).

Covers parallel/mesh.py's jax.distributed.initialize path, put_basket's
make_array_from_process_local_data branch, per-process loader shards, and
asserts the 2-process train step matches the single-process step on the
same global batch.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def dist_results(tmp_path_factory):
    workdir = tmp_path_factory.mktemp("dist")
    rng = np.random.RandomState(123)
    imgs = rng.uniform(-1, 1, (2, 8, 32, 32, 3)).astype(np.float32)
    labels = rng.randint(0, 10, (2, 8)).astype(np.int32)
    np.save(workdir / "imgs.npy", imgs)
    np.save(workdir / "labels.npy", labels)

    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("TPU", "LIBTPU", "CLOUD_TPU", "JAX_",
                                "XLA_", "PALLAS_AXON", "AXON"))}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    # Gloo's context init has a fixed ~30s internal deadline; under a
    # contended full-suite run (parallel XLA compiles on every core) a
    # child can miss it.  Retry the whole 2-process launch on a fresh
    # port — a real regression fails deterministically on every attempt.
    for attempt in range(3):
        for p in range(2):  # stale barrier files from a failed attempt
            try:
                os.remove(workdir / f"compiled{p}")
            except OSError:
                pass
        port = _free_port()
        procs = []
        for pid in range(2):
            procs.append(subprocess.Popen(
                [sys.executable,
                 os.path.join(REPO, "tests", "_multihost_child.py"),
                 str(pid), "2", str(port), str(workdir)],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
        # generous: under a full-suite run the children compile while every
        # core is busy with other tests' XLA compiles
        outs = [p.communicate(timeout=3600)[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
        if attempt == 2:
            for p, out in zip(procs, outs):
                assert p.returncode == 0, f"child failed:\n{out[-4000:]}"
    results = []
    for pid in range(2):
        with open(workdir / f"out{pid}.json") as f:
            results.append(json.load(f))
    return results, imgs, labels


@pytest.mark.slow
class TestTwoProcessDistributed:
    def test_sampler_shards_disjoint_and_complete(self, dist_results):
        (r0, r1), _, _ = dist_results
        s0, s1 = set(r0["shard"]), set(r1["shard"])
        assert not (s0 & s1), "process shards overlap"
        assert len(s0) + len(s1) == r0["ds_len"]

    def test_state_replicated_across_processes(self, dist_results):
        (r0, r1), _, _ = dist_results
        assert r0["step"] == r1["step"] == 1
        np.testing.assert_allclose(r0["fp_g"], r1["fp_g"], rtol=1e-6)
        np.testing.assert_allclose(r0["fp_d"], r1["fp_d"], rtol=1e-6)
        np.testing.assert_allclose(r0["d_loss"], r1["d_loss"], rtol=1e-5)

    def test_matches_single_process_step(self, dist_results):
        """Same global batch through the in-process (single-host 8-device)
        mesh must land on the same post-step parameters."""
        (r0, _), imgs, labels = dist_results
        from __graft_entry__ import _biggan_cfg
        from studiogan_tpu.models import build_discriminator, build_generator
        from studiogan_tpu.parallel.mesh import put_basket, setup_runtime
        from studiogan_tpu.train import TrainEngine

        cfg = _biggan_cfg(g_conv_dim=8, d_conv_dim=8, batch_size=8,
                          d_updates=2, acml=1)
        G, D = build_generator(cfg), build_discriminator(cfg)
        eng = TrainEngine(cfg, G, D)
        rt = setup_runtime()
        state = jax.device_put(eng.init_state(jax.random.PRNGKey(0)),
                               rt.replicated)
        gi, gl = put_basket(rt, imgs, labels)
        step = jax.jit(eng.train_step,
                       in_shardings=(rt.replicated, rt.basket, rt.basket),
                       out_shardings=(rt.replicated, rt.replicated))
        state, metrics = step(state, gi, gl)
        fp_g = sum(float(np.abs(np.asarray(p)).sum())
                   for p in jax.tree.leaves(jax.device_get(state.g_params)))
        fp_d = sum(float(np.abs(np.asarray(p)).sum())
                   for p in jax.tree.leaves(jax.device_get(state.d_params)))
        np.testing.assert_allclose(fp_g, r0["fp_g"], rtol=1e-4)
        np.testing.assert_allclose(fp_d, r0["fp_d"], rtol=1e-4)
        np.testing.assert_allclose(float(metrics["d_loss"]), r0["d_loss"],
                                   rtol=1e-3, atol=1e-4)
