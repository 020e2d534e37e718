"""Result plotting (reference RL_Train_main.py:117-278,
RL_Run_main.py:203-530, RL_Evaluated_main...:331-369).

Produces the same figure families as the reference entry scripts: training
loss / target-Q / online-Q / return-per-episode curves, and evaluation
mean +/- standard-error return bands for GNN-RL vs Random-Action. Import of
matplotlib is deferred and failures degrade to no-ops so headless training
never dies on a plotting backend.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

# The reference saves every figure as .png AND .eps (RL_Train_main.py:257-274,
# RL_Run_main.py:504-530); default here is png-only, pass
# formats=("png", "eps") for full reference parity.
DEFAULT_FORMATS = ("png",)


def _save(fig, plt, out_dir: str, name: str,
          formats: Sequence[str] = DEFAULT_FORMATS) -> None:
    for fmt in formats:
        fig.savefig(os.path.join(out_dir, f"{name}.{fmt}"),
                    dpi=120 if fmt == "png" else None)
    plt.close(fig)


def _get_plt():
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        return plt
    except Exception:
        return None


def smooth(curve: np.ndarray, window: int = 50) -> np.ndarray:
    """Moving-average smoothing (the paper smooths its raw return curves;
    reference README.md:13-17 and the helper at
    RL_Evaluated_main...:676-681)."""
    if window <= 1:
        return curve
    kernel = np.ones(window) / window
    return np.convolve(curve, kernel, mode="valid")


def plot_training(results: Dict[str, np.ndarray], out_dir: str,
                  window: int = 50,
                  formats: Sequence[str] = DEFAULT_FORMATS) -> None:
    plt = _get_plt()
    if plt is None:
        return
    os.makedirs(out_dir, exist_ok=True)

    def save(fig, name):
        _save(fig, plt, out_dir, name, formats)

    loss = results["train_loss"]            # [N, E, S]
    n = loss.shape[0]
    fig, ax = plt.subplots()
    for d in range(n):
        ax.plot(smooth(loss[d].mean(axis=1), window), label=f"D2D {d + 1}")
    ax.set_xlabel("training episode")
    ax.set_ylabel("loss")
    ax.legend()
    save(fig, "train-loss")

    fig, ax = plt.subplots()
    for d in range(n):
        ax.plot(smooth(results["train_q_mean"][d].mean(axis=1), window),
                label=f"target-Q D2D {d + 1}")
    ax.set_xlabel("training episode")
    ax.set_ylabel("mean target Q")
    ax.legend()
    save(fig, "target-q-mean")

    fig, ax = plt.subplots()
    for d in range(n):
        ax.plot(smooth(results["orig_train_q_mean"][d].mean(axis=1), window),
                label=f"online-Q D2D {d + 1}")
    ax.set_xlabel("training episode")
    ax.set_ylabel("mean online Q")
    ax.legend()
    save(fig, "online-q-mean")

    fig, ax = plt.subplots()
    ax.plot(smooth(results["reward_per_episode"], window))
    ax.set_xlabel("training episode")
    ax.set_ylabel("return per episode")
    save(fig, "return-per-episode")


def plot_evaluation(results: Dict[str, np.ndarray], out_dir: str,
                    interval: int = 5,
                    opt_return: Optional[float] = None,
                    formats: Sequence[str] = DEFAULT_FORMATS) -> None:
    """Mean +/- standard-error return bands over trials (reference
    RL_Evaluated_main...:331-369)."""
    plt = _get_plt()
    if plt is None:
        return
    os.makedirs(out_dir, exist_ok=True)
    ret = results["evaluation_return_per_episode"]    # [T, C]
    ra = results["ra_expect_return"]                  # [T, C]
    x = np.arange(1, ret.shape[1] + 1) * interval
    fig, ax = plt.subplots()
    for label, data in [("GNN-RL", ret), ("Random Action", ra)]:
        mean = data.mean(axis=0)
        se = data.std(axis=0) / np.sqrt(data.shape[0])
        ax.plot(x, mean, label=label)
        ax.fill_between(x, mean - se, mean + se, alpha=0.3)
    if opt_return is not None:
        ax.axhline(opt_return, linestyle="--", label="Optimal (episode 0)")
    ax.set_xlabel("training episode")
    ax.set_ylabel("return")
    ax.legend()
    _save(fig, plt, out_dir, "evaluation-return", formats)


def plot_test(results: Dict[str, np.ndarray], out_dir: str,
              formats: Sequence[str] = DEFAULT_FORMATS) -> None:
    """Test-run summaries: per-episode returns RL vs RA (vs Opt), V2I
    sum-rate success ratio vs thresholds (reference RL_Run_main.py:443-461)."""
    plt = _get_plt()
    if plt is None:
        return
    os.makedirs(out_dir, exist_ok=True)
    fig, ax = plt.subplots()
    ax.plot(np.sort(results["expect_return"]), label="GNN-RL")
    ax.plot(np.sort(results["ra_expect_return"]), label="Random Action")
    if "opt_expect_return" in results:
        ax.plot(np.sort(results["opt_expect_return"]), label="Optimal")
    ax.set_xlabel("episode (sorted)")
    ax.set_ylabel("return")
    ax.legend()
    _save(fig, plt, out_dir, "test-returns", formats)

    # V2I sum-rate success ratio vs thresholds 18..30 bit/s/Hz
    thresholds = np.arange(18, 31)
    v2i_sum = results["v2i_rate"].sum(axis=-1)        # [E, S]
    ra_v2i_sum = results["ra_v2i_rate"].sum(axis=-1)
    fig, ax = plt.subplots()
    for label, data in [("GNN-RL", v2i_sum), ("Random Action", ra_v2i_sum)]:
        ratio = [(data >= t).mean() for t in thresholds]
        ax.plot(thresholds, ratio, marker="o", label=label)
    ax.set_xlabel("V2I sum-rate threshold (bit/s/Hz)")
    ax.set_ylabel("success ratio")
    ax.legend()
    _save(fig, plt, out_dir, "v2i-success-ratio", formats)


def success_ratios(v2i_rate: np.ndarray, thresholds=range(18, 31)
                   ) -> Dict[int, float]:
    """P(V2I sum-rate >= threshold) (reference RL_Run_main.py:443-461)."""
    sums = v2i_rate.sum(axis=-1)
    return {int(t): float((sums >= t).mean()) for t in thresholds}
