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
    "StyleGAN3-r-ADA": "StyleGAN3-r-ADA.yaml",  # stylegan3-r filtered synthesis
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
    run_dir = os.path.join(out_root, name)
    os.makedirs(run_dir, exist_ok=True)
    short_cfg = os.path.join(run_dir, "cfg.yaml")
    yaml.safe_dump(cfg, open(short_cfg, "w"))

    cmd = [
        sys.executable, "-m", "studiogan_tpu.main", "-t",
        "-cfg", short_cfg, "-save", run_dir, "--synthetic_data",
        "-metrics", "none", "--print_freq", str(max(1, n_steps // 2)),
        "--save_freq", str(10 * n_steps),  # no checkpoint churn
        "--seed", "11",
    ]
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # high-res synthesis stacks (512/1024px) compile much longer
    limit = 4500 if batch_force is not None else 2700
    t0 = time.time()
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=limit, env=env, cwd=run_dir)
        rc = proc.returncode
        tail = (proc.stdout + proc.stderr).strip().splitlines()[-25:]
    except subprocess.TimeoutExpired:
        rc, tail = -9, [f"TIMEOUT {limit}s"]
    wall = time.time() - t0
    # last training log line carries the losses
    loss_line = next((ln for ln in reversed(tail) if "Gen_loss" in ln), "")
    return {"rc": rc, "wall_s": round(wall, 1), "last": loss_line.strip(),
            "tail": tail if rc != 0 else []}


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    out_root = tempfile.mkdtemp(prefix="chip_smoke_zoo_")
    out = os.path.join(REPO, "scripts", "chip_smoke_zoo.json")
    # resume: keep families that already passed (the sweep is hours long;
    # an interrupted run should not repeat finished work)
    results = {}
    if os.path.exists(out):
        prior = json.load(open(out))
        results = {k: v for k, v in prior.items() if v.get("rc") == 0}
        if results:
            print(f"resuming: {sorted(results)} already passed", flush=True)
    for name, cfg in FAMILIES.items():
        if name in results:
            continue
        print(f"=== {name} ({cfg}) ===", flush=True)
        results[name] = run_one(name, cfg, n_steps, out_root)
        status = "OK" if results[name]["rc"] == 0 else f"FAIL rc={results[name]['rc']}"
        print(f"    {status} in {results[name]['wall_s']}s  {results[name]['last']}",
              flush=True)
        json.dump(results, open(out, "w"), indent=1)
    n_ok = sum(r["rc"] == 0 for r in results.values())
    print(f"\n{n_ok}/{len(results)} families trained on chip; results -> {out}")


if __name__ == "__main__":
    main()
