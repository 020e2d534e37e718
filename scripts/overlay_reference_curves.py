"""Overlay the EXECUTED reference's training curves on this repo's.

Round-5 item 2 (the round-4 verdict's "executed-reference training-curve
comparison"): scripts/run_reference_training.py runs the reference's own
Agent.train (BS_brain.py:750-910) under legacy-Keras shims at reduced
scale; gnnra_tpu.harness.train_main runs this repo's trainer at the
IDENTICAL config (episodes x 20 train steps x 50 transitions, batch 512,
gamma 0.5, v2i_weight 0.1, epsilon annealed over 80% of the horizon).
This script overlays return-per-episode and loss curves and evaluates a
stated quantitative criterion.

Criterion (PASS requires all three):
  C1  same random-policy start: the first-50-episode mean returns agree
      within 2 combined SEs (both policies are epsilon~1 there, so this
      checks the ENV + reward engine produce the same reward scale);
  C2  same learned plateau: the final-quartile (last 125 episodes)
      per-RUN mean returns agree within 2 combined SEs (Welch, across
      runs: N_ref reference seeds vs N_repo repo seeds);
  C3  curve-shape band overlap: >= 80% of 25-episode windows have
      |mean_ref - mean_repo| <= 2*sqrt(SE_ref^2 + SE_repo^2), SEs over
      the window's pooled per-episode returns.

Usage:
  python scripts/overlay_reference_curves.py \
      --ref results-refcurve results-refcurve-s7 \
      --repo results-overlay/seed*/*/train-results.npz \
      --out docs/results
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# CVD-safe two-hue pair (validated blue/orange, distinct under
# protan/deutan/tritan simulation; band fills at low alpha of the same
# hues; text/grid in neutral ink)
C_REF = "#31688e"
C_REPO = "#dd8629"


def load_ref(dirs):
    runs = []
    for d in dirs:
        path = os.path.join(REPO, d, "ref_train_curves.npz")
        z = np.load(path)
        runs.append({"reward": z["reward_per_episode"],
                     "loss": z["train_loss"].mean(axis=(0, 2)),
                     "seed": int(z["seed"])})
    return runs


def load_repo(patterns):
    runs = []
    for pat in patterns:
        for path in sorted(glob.glob(os.path.join(REPO, pat))):
            z = np.load(path)
            runs.append({"reward": z["reward_per_episode"],
                         "loss": z["train_loss"].mean(axis=(0, 2)),
                         "path": path})
    return runs


def windowed(arrs, w):
    """arrs: list of [E] -> (centers, mean, se) pooling runs x window."""
    e = min(a.shape[0] for a in arrs)
    k = e // w
    stack = np.stack([a[:k * w].reshape(k, w) for a in arrs])  # [R, k, w]
    pooled = stack.transpose(1, 0, 2).reshape(k, -1)           # [k, R*w]
    return (np.arange(k) * w + w / 2, pooled.mean(axis=1),
            pooled.std(axis=1, ddof=1) / np.sqrt(pooled.shape[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", nargs="+",
                    default=["results-refcurve", "results-refcurve-s7"])
    ap.add_argument("--repo", nargs="+",
                    default=["results-overlay/seed*/*/train-results.npz"])
    ap.add_argument("--window", type=int, default=25)
    ap.add_argument("--out", default="docs/results")
    args = ap.parse_args()

    ref = load_ref(args.ref)
    rep = load_repo(args.repo)
    print(f"reference runs: {len(ref)} (seeds "
          f"{[r['seed'] for r in ref]}); repo runs: {len(rep)}")
    ref_r = [r["reward"] for r in ref]
    rep_r = [r["reward"] for r in rep]
    e = min(min(a.shape[0] for a in ref_r), min(a.shape[0] for a in rep_r))

    # --- C1: random-policy start (first 50 episodes, pooled)
    a = np.concatenate([r[:50] for r in ref_r])
    b = np.concatenate([r[:50] for r in rep_r])
    se = np.sqrt(a.var(ddof=1) / a.size + b.var(ddof=1) / b.size)
    c1 = abs(a.mean() - b.mean()) <= 2 * se
    print(f"C1 start: ref {a.mean():.0f} vs repo {b.mean():.0f} "
          f"(2SE {2 * se:.0f}) -> {'PASS' if c1 else 'FAIL'}")

    # --- C2: learned plateau (final quartile, per-run means, Welch).
    # Episode returns are extremely heavy-tailed (std ~ mean), so with
    # few runs the between-run variance estimate is unreliable; floor
    # each group's SE by its within-run sampling error (std over the
    # window's episodes / sqrt(window)), which lower-bounds the
    # uncertainty of a run's mean.
    q = e - e // 4
    am = np.array([r[q:e].mean() for r in ref_r])
    bm = np.array([r[q:e].mean() for r in rep_r])
    win_a = np.mean([r[q:e].var(ddof=1) / (e - q) for r in ref_r])
    win_b = np.mean([r[q:e].var(ddof=1) / (e - q) for r in rep_r])
    var_a = (am.var(ddof=1) / am.size) if am.size > 1 else 0.0
    se_a = max(np.sqrt(var_a), np.sqrt(win_a / am.size))
    se_b = max(np.sqrt(bm.var(ddof=1) / bm.size),
               np.sqrt(win_b / bm.size))
    se2 = np.sqrt(se_a ** 2 + se_b ** 2)
    c2 = abs(am.mean() - bm.mean()) <= 2 * se2
    print(f"C2 plateau: ref {am.mean():.0f} (runs {np.round(am)}) vs "
          f"repo {bm.mean():.0f} +- {bm.std(ddof=1):.0f} "
          f"(2SE {2 * se2:.0f}) -> {'PASS' if c2 else 'FAIL'}")

    # --- C3: windowed band overlap
    xs, m_ref, se_ref = windowed(ref_r, args.window)
    _, m_rep, se_rep = windowed(rep_r, args.window)
    gap = np.abs(m_ref - m_rep)
    tol = 2 * np.sqrt(se_ref ** 2 + se_rep ** 2)
    frac = float((gap <= tol).mean())
    c3 = frac >= 0.8
    print(f"C3 band overlap: {frac:.0%} of windows within 2 combined "
          f"SEs -> {'PASS' if c3 else 'FAIL'}")

    # --- plot
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.2))
    ax = axes[0]
    ax.fill_between(xs, m_ref - 2 * se_ref, m_ref + 2 * se_ref,
                    color=C_REF, alpha=0.18, linewidth=0)
    ax.fill_between(xs, m_rep - 2 * se_rep, m_rep + 2 * se_rep,
                    color=C_REPO, alpha=0.18, linewidth=0)
    ax.plot(xs, m_ref, color=C_REF, linewidth=2,
            label=f"reference (executed, {len(ref_r)} seeds)")
    ax.plot(xs, m_rep, color=C_REPO, linewidth=2,
            label=f"this repo ({len(rep_r)} seeds)")
    ax.set_xlabel("training episode")
    ax.set_ylabel("return per episode")
    ax.set_title(f"Return ({args.window}-episode windows, ±2 SE)")
    ax.legend(frameon=False)
    ax.grid(alpha=0.25, linewidth=0.5)

    ax = axes[1]
    xs_l, ml_ref, sl_ref = windowed([r["loss"] for r in ref], args.window)
    _, ml_rep, sl_rep = windowed([r["loss"] for r in rep], args.window)
    ax.fill_between(xs_l, ml_ref - 2 * sl_ref, ml_ref + 2 * sl_ref,
                    color=C_REF, alpha=0.18, linewidth=0)
    ax.fill_between(xs_l, ml_rep - 2 * sl_rep, ml_rep + 2 * sl_rep,
                    color=C_REPO, alpha=0.18, linewidth=0)
    ax.plot(xs_l, ml_ref, color=C_REF, linewidth=2, label="reference")
    ax.plot(xs_l, ml_rep, color=C_REPO, linewidth=2, label="this repo")
    ax.set_xlabel("training episode")
    ax.set_ylabel("mean Huber loss")
    ax.set_title("Training loss (per-head mean)")
    ax.legend(frameon=False)
    ax.grid(alpha=0.25, linewidth=0.5)

    fig.tight_layout()
    out_dir = os.path.join(REPO, args.out)
    os.makedirs(out_dir, exist_ok=True)
    out_png = os.path.join(out_dir, "overlay_training_curves.png")
    fig.savefig(out_png, dpi=140)
    print(f"saved {out_png}")

    summary = {
        "ref_runs": len(ref_r), "repo_runs": len(rep_r),
        "episodes": int(e), "window": args.window,
        "c1_start": {"ref": float(a.mean()), "repo": float(b.mean()),
                     "two_se": float(2 * se), "pass": bool(c1)},
        "c2_plateau": {"ref": float(am.mean()),
                       "ref_runs": [float(x) for x in am],
                       "repo": float(bm.mean()),
                       "repo_sd": float(bm.std(ddof=1)),
                       "two_se": float(2 * se2), "pass": bool(c2)},
        "c3_band_overlap": {"fraction": frac, "pass": bool(c3)},
        "overall_pass": bool(c1 and c2 and c3),
    }
    out_json = os.path.join(out_dir, "overlay_training_curves.json")
    with open(out_json, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(f"saved {out_json}")
    print("OVERALL:", "PASS" if summary["overall_pass"] else "FAIL")


if __name__ == "__main__":
    main()
