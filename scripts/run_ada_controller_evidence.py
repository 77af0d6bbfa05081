"""ADA-controller evidence: show ada_p moving under the real CLI.

Trains StyleGAN2-ADA (CIFAR) for a short horizon on the structured
drop and plots the logged per-step ``ada_p`` (the reference's
adaptive-augment probability controller, reference src/worker.py ADA
branch; ours lives in train/engine.py as on-device controller state).
The 20-step smoke sweep can't show the controller ramp — this run can:
with a tiny/structured dataset D overfits quickly, the r_t sign stays
positive, and ada_p must rise from 0 at ada_interval cadence.

Usage (quiet machine, single TPU process):
    python scripts/run_ada_controller_evidence.py [n_steps] [workdir]

Writes docs/evidence/convergence_sg2_cifar/ada_p_curve.png + .jsonl.
"""
from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, ".data", "structured_cifar")
EVIDENCE = os.path.join(REPO, "docs", "evidence", "convergence_sg2_cifar")


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    work = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, ".data", "ada_evidence_run")
    os.makedirs(work, exist_ok=True)
    os.makedirs(EVIDENCE, exist_ok=True)
    cfg = yaml.safe_load(open(os.path.join(
        REPO, "configs", "CIFAR10", "StyleGAN2-ADA.yaml")))
    cfg["OPTIMIZATION"]["total_steps"] = n_steps
    cfg_path = os.path.join(work, "cfg_ada.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    cmd = [sys.executable, "-m", "studiogan_tpu.main", "-t",
           "-cfg", cfg_path, "-data", DATA, "-save", work,
           "-metrics", "none", "--print_freq", "100",
           "--save_freq", str(n_steps), "--seed", "11"]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    log_path = os.path.join(EVIDENCE, "train_ada.log")
    t0 = time.time()
    with open(log_path, "w") as f:
        rc = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                            env=env, cwd=work).returncode
    print(f"ada run: rc={rc} ({time.time()-t0:.0f}s)", flush=True)
    assert rc == 0, f"CLI failed, see {log_path}"

    stats_dir = sorted(glob.glob(os.path.join(work, "statistics", "*")),
                       key=os.path.getmtime)[-1]
    rows = [json.loads(ln) for ln in
            open(os.path.join(stats_dir, "train_stats.jsonl"))]
    curve = [(r["step"], r["ada_p"]) for r in rows if "ada_p" in r]
    with open(os.path.join(EVIDENCE, "ada_p_curve.jsonl"), "w") as f:
        for s, p in curve[::10]:
            f.write(json.dumps({"step": s, "ada_p": p}) + "\n")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    xs, ys = zip(*curve)
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(xs, ys, lw=1.5, color="tab:red")
    ax.set_xlabel("step"); ax.set_ylabel("ada_p")
    ax.set_title(f"ADA augment-probability controller "
                 f"(StyleGAN2-ADA CIFAR, {n_steps} steps on chip)")
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(EVIDENCE, "ada_p_curve.png"), dpi=120)
    moved = max(ys) - min(ys)
    print(f"ada_p: min {min(ys):.4f} max {max(ys):.4f} (moved {moved:.4f})",
          flush=True)
    assert moved > 0, "ada_p never moved — controller inert?"


if __name__ == "__main__":
    main()
