"""Drive the StyleGAN2-D2DCE-DiffAug CIFAR convergence run on the chip.

Round-4 verdict item 5: the SG2-D2DCE-DiffAug workload is a headline
perf claim (11.3 steps/s @ 88.9% MFU lb) with zero convergence
evidence.  This script runs the REAL CLI on the structured on-disk
CIFAR drop (scripts/make_structured_cifar.py):

  phase 1: train 0 -> N1 steps (lazy R1 active every d_reg_interval,
           DiffAug on, kimg-EMA with rampup),
  phase 2: RESUME in a fresh process N1 -> N2 (proves chip-side orbax
           resume for the stylegan state layout),
  then:    per-class quality proxy (G_ema vs data palette) at N1 and
           N2, loss/SN curve plots, and the evidence bundle under
           docs/evidence/convergence_sg2_cifar/.

Reference analog: logs/CIFAR10/CIFAR10-StyleGAN2-D2DCE-DiffAug-Rev-
train-2022_02_04_16_46_16.log (1.17M steps on a GPU rig; this is the
same config and code path at a shorter horizon).

Usage (quiet machine, single TPU process):
    python scripts/run_convergence_sg2.py [N1] [N2] [workdir]
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, ".data", "structured_cifar")
EVIDENCE = os.path.join(REPO, "docs", "evidence", "convergence_sg2_cifar")


def write_cfg(path: str, total_steps: int) -> None:
    cfg = yaml.safe_load(open(os.path.join(
        REPO, "configs", "CIFAR10", "StyleGAN2-D2DCE-DiffAug.yaml")))
    cfg["OPTIMIZATION"]["total_steps"] = total_steps
    yaml.safe_dump(cfg, open(path, "w"))


def run_cli(cfg_path: str, save_dir: str, log_path: str, seed: int = 11,
            ckpt: str | None = None) -> None:
    cmd = [sys.executable, "-m", "studiogan_tpu.main", "-t",
           "-cfg", cfg_path, "-data", DATA, "-save", save_dir,
           "-metrics", "none", "--print_freq", "100",
           "--save_freq", "1000", "--seed", str(seed)]
    if ckpt:
        cmd += ["-ckpt", ckpt]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.time()
    with open(log_path, "w") as f:
        rc = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                            env=env, cwd=save_dir).returncode
    print(f"{os.path.basename(log_path)}: rc={rc} "
          f"({time.time()-t0:.0f}s)", flush=True)
    assert rc == 0, f"CLI failed, see {log_path}"


def latest(pattern: str) -> str:
    paths = sorted(glob.glob(pattern), key=os.path.getmtime)
    assert paths, f"nothing matches {pattern}"
    return paths[-1]


def proxy(cfg_path: str, ckpt_dir: str, out_path: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "convergence_quality_proxy.py"),
         cfg_path, ckpt_dir, DATA],
        capture_output=True, text=True, env=env)
    line = p.stdout.strip().splitlines()[-1]
    row = json.loads(line)
    with open(out_path, "a") as f:
        f.write(line + "\n")
    print("proxy:", line, flush=True)
    return row


def main():
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    work = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, ".data", "sg2_conv_run")
    assert os.path.isdir(DATA), \
        f"run scripts/make_structured_cifar.py {os.path.dirname(DATA)} first"
    os.makedirs(work, exist_ok=True)
    os.makedirs(EVIDENCE, exist_ok=True)

    qp = os.path.join(EVIDENCE, "quality_proxy.jsonl")
    if os.path.exists(qp):
        os.unlink(qp)  # fresh run, fresh proxy ledger
    cfg1 = os.path.join(work, "cfg_phase1.yaml")
    cfg2 = os.path.join(work, "cfg_phase2.yaml")
    write_cfg(cfg1, n1)
    write_cfg(cfg2, n2)

    run_cli(cfg1, work, os.path.join(EVIDENCE, "train_phase1.log"))
    ckpt_dir = latest(os.path.join(work, "checkpoints", "*"))
    proxy(cfg1, ckpt_dir, os.path.join(EVIDENCE, "quality_proxy.jsonl"))

    # fresh-process resume (phase 2)
    run_cli(cfg2, work, os.path.join(EVIDENCE, "train_phase2_resume.log"),
            ckpt=ckpt_dir)
    ckpt_dir = latest(os.path.join(work, "checkpoints", "*"))
    proxy(cfg2, ckpt_dir, os.path.join(EVIDENCE, "quality_proxy.jsonl"))

    # evidence bundle: stats, curves, configs, per-class sample grid
    stats_dir = latest(os.path.join(work, "statistics", "*"))
    stats = os.path.join(stats_dir, "train_stats.jsonl")
    import gzip
    with open(stats, "rb") as fin, gzip.open(
            os.path.join(EVIDENCE, "train_stats.jsonl.gz"), "wb") as fout:
        shutil.copyfileobj(fin, fout)
    shutil.copy(cfg1, os.path.join(EVIDENCE, "cfg.yaml"))
    shutil.copy(cfg2, os.path.join(EVIDENCE, "cfg_resume.yaml"))
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run([sys.executable,
                    os.path.join(REPO, "scripts", "plot_convergence.py"),
                    stats_dir, EVIDENCE], check=True, env=env)
    # canvases the CLI wrote during training (last one = final samples)
    figs = sorted(glob.glob(os.path.join(
        work, "figures", "*", "generated_canvas_*.png")))
    if figs:
        shutil.copy(figs[-1], os.path.join(
            EVIDENCE, f"generated_canvas_step{n2}.png"))
    print("evidence ->", EVIDENCE, flush=True)


if __name__ == "__main__":
    main()
