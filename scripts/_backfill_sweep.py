"""Backfill chip_smoke_zoo.json entries recorded before mid-sweep fixes.

Recomputes per-family compile_s (the timestamp parser was wrong for the
first few families of the round-4 sweep) from the kept child.log files,
and re-runs the strengthened _smoke_check (d_loss_varies criterion) for
entries whose checks predate it.  Idempotent; CPU-only.

Usage: python scripts/_backfill_sweep.py <sweep_out_root>
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
from chip_smoke_zoo import _compile_seconds  # noqa: E402


def main():
    out_root = sys.argv[1]
    out = os.path.join(REPO, "scripts", "chip_smoke_zoo.json")
    results = json.load(open(out))
    for name, res in results.items():
        run_dir = os.path.join(out_root, name)
        log = os.path.join(run_dir, "child.log")
        if res.get("compile_s") is None and os.path.exists(log):
            res["compile_s"] = _compile_seconds(
                open(log, errors="replace").read().splitlines())
        if (res.get("ok") and "d_loss_varies" not in res.get("checks", {})
                and os.path.isdir(run_dir)):
            env = {k: v for k, v in os.environ.items()
                   if not (k.startswith("PALLAS_AXON") or k.startswith("AXON")
                           or k == "JAX_PLATFORMS")}
            env.update(JAX_PLATFORMS="cpu",
                       PYTHONPATH=REPO + os.pathsep + env.get("PYTHONPATH", ""))
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "scripts",
                                              "_smoke_check.py"),
                 run_dir, os.path.join(run_dir, "cfg.yaml"), "11"],
                capture_output=True, text=True, timeout=900, env=env)
            checks = json.loads(proc.stdout.strip().splitlines()[-1])
            res["ok"] = checks.pop("ok", False)
            res["checks"] = checks
        print(name, "compile_s=", res.get("compile_s"),
              "ok=", res.get("ok"))
    json.dump(results, open(out, "w"), indent=1)


if __name__ == "__main__":
    main()
