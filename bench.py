"""Benchmark: BigGAN training throughput + MFU on one TPU chip.

Workloads (mirroring the reference's headline training runs, BASELINE.md):

  * CIFAR10-32 BigGAN bs64, one step = 5 D + 1 G updates.  Reference:
    2.17 steps/s on 1 GPU (logs/CIFAR10/BigGAN-train-2021_01_15_14_48_48).
    Measured both with pre-staged device tensors (kernel throughput) and
    end-to-end through BasketLoader (host pipeline + transfer included).
  * CIFAR10-32 StyleGAN2-D2DCE-DiffAug (the reference's best-FID CIFAR
    run): 7.76 steps/s on its rig.
  * ImageNet-128 BigGAN, effective batch 256.  Reference: 0.32 steps/s =
    ~82 imgs/s on a multi-GPU DP rig (logs/IMAGENET/BigGAN256).

MFU = model FLOPs/step (XLA cost analysis of the compiled step) divided
by measured wall time and the chip's measured matmul peak.

Prints ONE JSON line.  Robustness contract (round-2/3/4 postmortems —
driver runs have timed out mid-compile, and in round 4 the CIFAR section
ate the ImageNet section's budget):

  * the TPU persistent compile cache lives at ``.jax_cache/tpu`` and is
    COMMITTED — TPU executables are host-CPU-independent, so a driver
    run on a fresh machine starts warm and skips every heavy compile
    (round-4 root cause: the cache was machine-local and rounds hop
    machines);
  * the orchestrator (this file, no --section arg) runs each workload
    in its own subprocess with a hard per-section cap, so no section
    can eat a later section's reservation; a killed section is recorded
    as ``<name>_killed_budget`` with its wall time;
  * unrolled-scan FLOPs counts are cached in ``bench_flops.json``
    (committed), so reruns never pay the count-only lower+compiles;
  * a watchdog emits the JSON line with whatever workloads completed
    after ``STUDIOGAN_BENCH_BUDGET_S`` seconds (default 960), kills any
    in-flight section child, and exits 0;
  * per-workload failures are logged to stderr, never swallowed;
  * the emitted line records machine state (cores, load, cache entries)
    so a slow driver run is diagnosable after the fact.

Timing gotcha: on the tunneled `axon` platform ``block_until_ready``
measures enqueue rate, not execution — every window must end with a
device->host VALUE fetch (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time
import traceback

_REPO = os.path.dirname(os.path.abspath(__file__))
# committed, host-independent TPU executable cache (see module docstring)
_TPU_CACHE = os.path.join(_REPO, ".jax_cache", "tpu")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", _TPU_CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BASELINE_CIFAR_STEPS_PER_SEC = 2.17
BASELINE_IMAGENET_IMGS_PER_SEC = 82.0  # 0.32 steps/s * 256 (whole DP rig)
# StyleGAN2-D2DCE-DiffAug CIFAR10: 1,167,700 steps in 1d 17:49:39
# (logs/CIFAR10/CIFAR10-StyleGAN2-D2DCE-DiffAug-Rev tail)
BASELINE_SG2_CIFAR_STEPS_PER_SEC = 7.755

_FLOPS_SIDECAR = os.path.join(_REPO, "bench_flops.json")
_T0 = time.time()
_BUDGET = float(os.environ.get("STUDIOGAN_BENCH_BUDGET_S", "960"))

# cold-compile wall estimates (builder machine, empty cache — round-4
# measurements: cifar 305s, imagenet 626s); used for reservations only
_COLD_NEED = {"cifar": 350, "imagenet128": 630, "stylegan2": 420,
              "cifar_e2e": 280}

results: dict = {}
_emitted = threading.Event()
_current_child: subprocess.Popen | None = None


def _emit_json_line(final: bool = True):
    """Print the driver-parsed JSON line from whatever completed so far.

    Called incrementally after EACH section (round-3 postmortem: the
    watchdog-only emission meant a kill -9 mid-section left *nothing*
    on stdout).  Each call prints the full cumulative line; the driver
    parses the last JSON line, so later emissions strictly add data.
    """
    if _emitted.is_set():
        return
    if final:
        _emitted.set()
    if "cifar_steps_per_sec" in results:
        head = {
            "metric": "biggan_cifar10_train_steps_per_sec",
            "value": results["cifar_steps_per_sec"],
            "unit": "steps/s (1 step = 5 D + 1 G updates, bs64)",
            "vs_baseline": round(
                results["cifar_steps_per_sec"] / BASELINE_CIFAR_STEPS_PER_SEC,
                4),
        }
    elif "imagenet128_imgs_per_sec_per_chip" in results:
        head = {
            "metric": "biggan_imagenet128_imgs_per_sec_per_chip",
            "value": results["imagenet128_imgs_per_sec_per_chip"],
            "unit": "imgs/s/chip (1 D + 1 G updates, effective batch 256)",
            "vs_baseline": results.get("imagenet128_vs_reference_rig"),
        }
    else:  # nothing finished in budget — still emit a parseable line
        head = {
            "metric": "biggan_cifar10_train_steps_per_sec",
            "value": None, "unit": "steps/s", "vs_baseline": None,
        }
    head["bench_elapsed_s"] = round(time.time() - _T0, 1)
    print(json.dumps({**head, **results}), flush=True)


def _watchdog():
    results["timeout_guard_fired"] = True
    sys.stderr.write(
        f"bench watchdog: budget {_BUDGET}s exhausted, emitting partial "
        f"results ({sorted(results)})\n")
    sys.stderr.flush()
    if _current_child is not None and _current_child.poll() is None:
        _current_child.kill()  # don't leave an orphan TPU process behind
    _emit_json_line()
    os._exit(0)


def _remaining() -> float:
    return _BUDGET - (time.time() - _T0)


def _mark(msg: str) -> None:
    sys.stderr.write(f"bench [{time.time() - _T0:7.1f}s] {msg}\n")
    sys.stderr.flush()


def _machine_info() -> dict:
    """Record enough host state to diagnose a slow driver run."""
    info = {}
    try:
        info["cores"] = os.cpu_count()
        info["load1"] = round(os.getloadavg()[0], 2)
        info["tpu_cache_entries"] = len(os.listdir(_TPU_CACHE)) \
            if os.path.isdir(_TPU_CACHE) else 0
        from __graft_entry__ import _machine_cache_dir
        info["host_fp"] = os.path.basename(_machine_cache_dir(_REPO, "cpu"))
    except Exception:  # diagnostics must never break the bench
        pass
    return info


def _load_flops_cache() -> dict:
    try:
        with open(_FLOPS_SIDECAR) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_flops_cache(cache: dict) -> None:
    tmp = _FLOPS_SIDECAR + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
    os.replace(tmp, _FLOPS_SIDECAR)


def _sync(metrics, st):
    """Force device->host value fetch so timers measure execution.
    (train_steps returns a stacked (n,) metric axis — take the last.)"""
    return float(np.asarray(metrics["d_loss"]).ravel()[-1]) + float(
        jax.tree.leaves(st.g_params)[0].ravel()[0])


def _measure_peak_tflops() -> float:
    """Measured chained-matmul peak (f32 operands, default MXU precision —
    the same regime the model's convs run in)."""
    n = 8192
    iters = 32
    x = jnp.asarray(np.random.RandomState(0).randn(n, n), jnp.float32)
    w = jnp.asarray(np.random.RandomState(1).randn(n, n), jnp.float32) * 0.01

    @jax.jit
    def chain(x, w):
        def body(c, _):
            c = c @ w
            c = c * jax.lax.rsqrt(jnp.mean(jnp.square(c)) + 1e-6)
            return c, ()
        return jax.lax.scan(body, x, None, length=iters)[0]

    out = chain(x, w)
    float(out[0, 0])  # warm + settle
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(out, w)
        float(out[0, 0])
        dt = time.perf_counter() - t0
        best = max(best, 2 * n * n * n * iters / dt / 1e12)
    return best


def _step_flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def _bench_cfg_run(cfg, n_steps=20, windows=3, warmup=3, flops_cfg=None,
                   time_unrolled=False, flops_key=None):
    """Compile the train step for cfg and time it.  Returns
    (steps_per_sec, flops_per_step).

    FLOPs accounting gotcha: XLA's cost_analysis counts a while-loop
    (lax.scan) body ONCE regardless of trip count, so the step is
    re-lowered with the du/acml scans fully unrolled just for counting.
    ``flops_cfg`` optionally supplies a smaller-micro-batch config with
    the same effective batch for the unrolled count (conv FLOPs are
    linear in batch), for configs whose unrolled form doesn't fit HBM.
    ``flops_key`` caches the unrolled count in bench_flops.json so
    reruns skip the count-only compile entirely."""
    from studiogan_tpu.models import build_discriminator, build_generator
    from studiogan_tpu.train import TrainEngine

    G, D = build_generator(cfg), build_discriminator(cfg)
    # time_unrolled: CIFAR's 5-D-update scan runs ~2% faster unrolled
    # (XLA schedules across micros) and its cost analysis is then exact,
    # so one compile serves both timing and FLOPs counting
    eng = TrainEngine(cfg, G, D, unroll_scans=time_unrolled)
    state = eng.init_state(jax.random.PRNGKey(0))

    def staged_basket(c):
        n_micro = (c.OPTIMIZATION.d_updates_per_step
                   * c.OPTIMIZATION.acml_steps)
        sz = c.DATA.img_size
        rng = np.random.RandomState(0)
        imgs = jnp.asarray(
            rng.uniform(-1, 1, (n_micro, c.OPTIMIZATION.batch_size, sz, sz, 3)),
            jnp.float32)
        labels = jnp.asarray(
            rng.randint(0, c.DATA.num_classes,
                        (n_micro, c.OPTIMIZATION.batch_size)), jnp.int32)
        return imgs, labels

    imgs, labels = staged_basket(cfg)
    step = jax.jit(eng.train_step, donate_argnums=0)
    t_c = time.time()
    compiled = step.lower(state, imgs, labels).compile()
    compile_s = round(time.time() - t_c, 1)
    sys.stderr.write(f"bench: train-step compile {compile_s}s\n")
    flops = _step_flops(compiled)  # fallback: undercounts scan bodies

    n_micro = (cfg.OPTIMIZATION.d_updates_per_step
               * cfg.OPTIMIZATION.acml_steps)
    if (n_micro == 1 and not time_unrolled) or time_unrolled:
        pass  # the count from the timing compile is already exact:
        # either there are no scans in the step, or they were unrolled
    else:
        # looped timing compile undercounts scan bodies — take the exact
        # unrolled count from the committed sidecar (round-3 fix: the
        # sidecar is consulted FIRST, so a cold driver run never pays
        # the expensive unrolled count-only compile)
        cache = _load_flops_cache()
        if flops_key is not None and flops_key in cache:
            flops = float(cache[flops_key])
        else:
            fcfg = flops_cfg or cfg
            try:
                G2, D2 = build_generator(fcfg), build_discriminator(fcfg)
                eng_u = TrainEngine(fcfg, G2, D2, unroll_scans=True)
                st_u = eng_u.init_state(jax.random.PRNGKey(0))
                fi, fl = staged_basket(fcfg)
                flops = _step_flops(
                    jax.jit(eng_u.train_step).lower(st_u, fi, fl).compile())
                del st_u
                if flops_key is not None:
                    cache[flops_key] = flops
                    _save_flops_cache(cache)
            except Exception:
                # keep the (under-counting) looped number, but SAY so —
                # a silent fallback reports a wrong (low) MFU
                sys.stderr.write(
                    "bench: unrolled FLOPs count failed, MFU will be "
                    "under-counted:\n" + traceback.format_exc())
                sys.stderr.flush()

    for _ in range(warmup):
        state, m = step(state, imgs, labels)
        _sync(m, state)
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, m = step(state, imgs, labels)
        _sync(m, state)
        rates.append(n_steps / (time.perf_counter() - t0))
    return max(rates), flops


def _bench_cifar_e2e(cfg, n_steps=20, chunk=10):
    """End-to-end: BasketLoader (C++ assemble + prefetch thread) ->
    chunked put_basket -> train_steps scan, exactly like the CLI train
    loop (main.py chunked dispatch at print_freq granularity)."""
    from studiogan_tpu.data.datasets import Dataset_
    from studiogan_tpu.data.pipeline import BasketLoader, DevicePrefetcher
    from studiogan_tpu.models import build_discriminator, build_generator
    from studiogan_tpu.parallel.mesh import setup_runtime
    from studiogan_tpu.train import TrainEngine

    O = cfg.OPTIMIZATION
    G, D = build_generator(cfg), build_discriminator(cfg)
    eng = TrainEngine(cfg, G, D)
    state = eng.init_state(jax.random.PRNGKey(0))
    rt = setup_runtime()
    state = jax.device_put(state, rt.replicated)

    ds = Dataset_("SYNTHETIC", None, train=True, synthetic_size=8192,
                  num_classes=cfg.DATA.num_classes, img_size=cfg.DATA.img_size)
    loader = BasketLoader(ds, batch_size=O.batch_size,
                          basket_multiplier=O.d_updates_per_step * O.acml_steps,
                          random_flip=True, seed=0, prefetch=4,
                          raw_uint8=True)
    dev_it = iter(DevicePrefetcher(loader, rt, chunk))
    steps_fn = jax.jit(eng.train_steps, donate_argnums=0,
                       in_shardings=(rt.replicated, rt.basket_chunk,
                                     rt.basket_chunk),
                       out_shardings=(rt.replicated, rt.replicated))

    def one_chunk(state):
        gi, gl = next(dev_it)
        return steps_fn(state, gi, gl)

    state, m = one_chunk(state)  # warmup / compile
    _sync(m, state)
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(max(1, n_steps // chunk)):
            state, m = one_chunk(state)
        _sync(m, state)
        rates.append(max(1, n_steps // chunk) * chunk
                     / (time.perf_counter() - t0))
    loader.close()
    return max(rates)


# --------------------------------------------------------------------------
# Section bodies.  Each runs in its OWN subprocess (fresh XLA client) so
# the orchestrator can enforce a hard per-section cap without leaving the
# tunnel in a weird state; each returns the dict merged into `results`.
# --------------------------------------------------------------------------

def _peak_tflops_value() -> tuple[float, bool]:
    """(peak, from_sidecar).  The chained-matmul peak is a hardware
    constant; it is cached in the committed sidecar and only re-measured
    on STUDIOGAN_BENCH_REMEASURE_PEAK=1 (the 8k x 8k scan costs minutes
    of compile)."""
    cache = _load_flops_cache()
    pk = f"measured_peak_tflops_{os.environ.get('PALLAS_AXON_TPU_GEN', 'tpu')}"
    if pk not in cache:  # fall back to any cached peak (the chip gen
        pk = next((k for k in sorted(cache)  # env var may be unset in
                   if k.startswith("measured_peak_tflops")), pk)  # driver env
    if pk in cache and not os.environ.get("STUDIOGAN_BENCH_REMEASURE_PEAK"):
        return float(cache[pk]), True
    peak = _measure_peak_tflops()
    cache[pk] = round(peak, 1)
    _save_flops_cache(cache)
    return peak, False


def _sec_peak() -> dict:
    peak, from_sidecar = _peak_tflops_value()
    return {"measured_matmul_peak_tflops": round(peak, 1),
            "peak_from_sidecar": from_sidecar}


def _sec_cifar(peak_tflops: float) -> dict:
    # Timed with the LOOPED (scan) step: its compile is ~5x cheaper than
    # the 5-D-update unrolled program and only ~2% slower to run — the
    # round-3 driver bench lost its whole budget to the unrolled compile.
    # Exact FLOPs come from the committed sidecar (unrolled count, primed
    # once on-chip by scripts/prime_bench_flops.py).
    from __graft_entry__ import _biggan_cfg
    mpc = os.environ.get("STUDIOGAN_BENCH_MPC") == "1"
    cfg = _biggan_cfg()
    cfg.RUN.mixed_precision = mpc
    sps, flops = _bench_cfg_run(
        cfg, flops_key=f"cifar_biggan_bs64_du5_unrolled_mpc{int(mpc)}")
    return {
        "cifar_steps_per_sec": round(sps, 3),
        "cifar_model_tflops_per_step": round(flops / 1e12, 3),
        "cifar_mfu": round(flops * sps / (peak_tflops * 1e12), 4),
    }


def _imagenet_cfg(bs, acml):
    from studiogan_tpu.config import Configurations
    c = Configurations(os.path.join(
        _REPO, "configs", "ImageNet", "BigGAN2048.yaml"))
    c.OPTIMIZATION.batch_size = bs
    c.OPTIMIZATION.acml_steps = acml
    c.RUN.mixed_precision = True
    c.finalize()
    return c


def _sec_imagenet128(peak_tflops: float) -> dict:
    # Largest micro-batch that fits decides throughput (blockwise
    # attention removed the (N,4096,1024) map ceiling): bf16 runs the
    # whole effective batch as ONE bs256 micro (no scans -> the FLOPs
    # count is exact from the timing compile, one compile total).
    icfg = _imagenet_cfg(256, 1)
    isps, iflops = _bench_cfg_run(icfg, n_steps=8, windows=2, warmup=2)
    eff = icfg.OPTIMIZATION.batch_size * icfg.OPTIMIZATION.acml_steps
    return {
        "imagenet128_precision": "bf16",
        "imagenet128_imgs_per_sec_per_chip": round(isps * eff, 1),
        "imagenet128_model_tflops_per_step": round(iflops / 1e12, 3),
        "imagenet128_mfu": round(iflops * isps / (peak_tflops * 1e12), 4),
        "imagenet128_vs_reference_rig": round(
            isps * eff / BASELINE_IMAGENET_IMGS_PER_SEC, 3),
    }


def _sec_stylegan2(peak_tflops: float) -> dict:
    # CIFAR10-32 StyleGAN2-D2DCE-DiffAug (2 D + 1 G at bs64, lazy R1
    # every d_reg_interval; 32 timed steps amortize the R1 events).
    from studiogan_tpu.config import Configurations
    scfg = Configurations(os.path.join(
        _REPO, "configs", "CIFAR10", "StyleGAN2-D2DCE-DiffAug.yaml"))
    scfg.RUN.train = True
    scfg.finalize()
    # FLOPs caveat: an unrolled count of the full step includes BOTH
    # lax.cond branches, and the lazy-R1 body (double-grad) only runs
    # every d_reg_interval steps — that count lands above the roofline.
    # Count the R1-disabled variant instead: a strict LOWER bound on
    # per-step model work → lower-bound MFU.
    sflops_cfg = Configurations(os.path.join(
        _REPO, "configs", "CIFAR10", "StyleGAN2-D2DCE-DiffAug.yaml"))
    sflops_cfg.RUN.train = True
    sflops_cfg.LOSS.apply_r1_reg = False
    sflops_cfg.LOSS.r1_place = "N/A"
    sflops_cfg.finalize()
    ssps, sflops = _bench_cfg_run(scfg, n_steps=32, windows=2, warmup=4,
                                  flops_cfg=sflops_cfg,
                                  flops_key="sg2_cifar_r1off_unrolled")
    return {
        "stylegan2_cifar_steps_per_sec": round(ssps, 3),
        "stylegan2_cifar_vs_reference": round(
            ssps / BASELINE_SG2_CIFAR_STEPS_PER_SEC, 3),
        "stylegan2_cifar_tflops_per_step_lb": round(sflops / 1e12, 3),
        "stylegan2_cifar_mfu_lb": round(
            ssps * sflops / (peak_tflops * 1e12), 4),
    }


def _sec_cifar_e2e(peak_tflops: float) -> dict:
    from __graft_entry__ import _biggan_cfg
    cfg = _biggan_cfg()
    cfg.RUN.mixed_precision = os.environ.get("STUDIOGAN_BENCH_MPC") == "1"
    return {"cifar_steps_per_sec_e2e": round(_bench_cifar_e2e(cfg), 3)}


_SECTIONS = {
    "peak": _sec_peak,
    "cifar": _sec_cifar,
    "imagenet128": _sec_imagenet128,
    "stylegan2": _sec_stylegan2,
    "cifar_e2e": _sec_cifar_e2e,
}


def _run_section_child(name: str, cap_s: float, peak: float) -> dict:
    """Run one section in a subprocess with a hard wall-clock cap.
    Stdout/stderr stream through; results come back via a temp file."""
    global _current_child
    import tempfile
    out = tempfile.NamedTemporaryFile(suffix=".json", delete=False).name
    cmd = [sys.executable, "-u", os.path.abspath(__file__),
           "--section", name, "--out", out, "--peak", str(peak)]
    t0 = time.time()
    _current_child = subprocess.Popen(cmd, cwd=_REPO)
    killed = False
    try:
        rc = _current_child.wait(timeout=cap_s)
    except subprocess.TimeoutExpired:
        _current_child.kill()
        _current_child.wait()
        rc, killed = -9, True
    finally:
        _current_child = None
    wall = round(time.time() - t0, 1)
    sec: dict = {f"{name}_section_s": wall}
    if killed:
        sec[f"{name}_killed_budget"] = round(cap_s, 1)
        sys.stderr.write(f"bench: section {name} KILLED at its "
                         f"{cap_s:.0f}s cap\n")
    elif rc != 0:
        sec[f"{name}_error"] = f"section subprocess rc={rc}"
        sys.stderr.write(f"bench: section {name} FAILED rc={rc}\n")
    else:
        try:
            with open(out) as f:
                sec.update(json.load(f))
        except Exception:
            sec[f"{name}_error"] = "section wrote no parseable results"
    try:
        os.unlink(out)
    except OSError:
        pass
    return sec


def _section_main(name: str, out_path: str, peak: float) -> None:
    """Child mode: run one section inline, write its results JSON."""
    fn = _SECTIONS[name]
    res = fn() if name == "peak" else fn(peak)
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(res, f)
    os.replace(tmp, out_path)


def main():
    threading.Timer(max(30.0, _BUDGET - (time.time() - _T0)),
                    _watchdog).start()
    results["machine"] = _machine_info()

    # peak: pure sidecar read unless a re-measure is forced (then it
    # needs the device -> run it as a capped section child too)
    if os.environ.get("STUDIOGAN_BENCH_REMEASURE_PEAK"):
        results.update(_run_section_child("peak", min(300, _remaining() - 30),
                                          0.0))
    else:
        with_sidecar = _sec_peak()
        results.update(with_sidecar)
    peak_tflops = float(results.get("measured_matmul_peak_tflops") or 136.2)
    _emit_json_line(final=False)

    # Reservation plan (round-4 verdict item 2): CIFAR may not eat the
    # ImageNet budget.  CIFAR's cap is min(its cold need, what's left
    # after reserving ImageNet's cold need); ImageNet then gets all
    # remaining time; SG2/e2e only run with their cold need still free
    # (they are warm-cache bonuses, and both were skipped_budget in the
    # round-4 cold run too).
    plan = [
        ("cifar", lambda: min(_COLD_NEED["cifar"],
                              _remaining() - _COLD_NEED["imagenet128"])),
        ("imagenet128", lambda: _remaining() - 15),
        ("stylegan2", lambda: (_remaining() - 15
                               if _remaining() > _COLD_NEED["stylegan2"]
                               else 0)),
        ("cifar_e2e", lambda: (_remaining() - 10
                               if _remaining() > _COLD_NEED["cifar_e2e"]
                               else 0)),
    ]
    for name, cap_fn in plan:
        cap = cap_fn()
        if cap < 45:
            results[f"{name}_skipped_budget"] = True
            _mark(f"{name}: skipped (remaining {_remaining():.0f}s)")
            continue
        _mark(f"{name}: start (cap {cap:.0f}s)")
        results.update(_run_section_child(name, cap, peak_tflops))
        _mark(f"{name}: done")
        _emit_json_line(final=False)
        if name == "cifar" and "cifar_killed_budget" in results:
            # the cap kill proves this machine is slow AND the compile
            # cache cold — the ImageNet cold compile cannot fit the
            # remaining budget either, so salvage the primary headline:
            # re-run CIFAR with everything that's left (its cold compile
            # DOES fit, and any partial cache writes make it cheaper)
            cap = _remaining() - 15
            if cap > 45:
                _mark(f"cifar: retry uncapped ({cap:.0f}s) — machine "
                      f"slow+cold, imagenet reservation released")
                results.update(_run_section_child("cifar", cap, peak_tflops))
                _emit_json_line(final=False)
            for later in ("imagenet128", "stylegan2", "cifar_e2e"):
                results[f"{later}_skipped_budget"] = True
            break

    _emit_json_line()
    os._exit(0)  # don't wait for the watchdog timer thread


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--section":
        # child mode: bench.py --section NAME --out FILE --peak X
        args = dict(zip(sys.argv[1::2], sys.argv[2::2]))
        _section_main(args["--section"], args["--out"],
                      float(args.get("--peak", "0") or 0))
    else:
        main()
