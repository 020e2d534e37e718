"""Test entry point (reference RL_Run_main.py).

Loads a trained checkpoint and evaluates the greedy policy against the
Random-Action baseline (and optionally the brute-force Optimal scheme); prints
win counts, average returns/rates/interference, and V2I sum-rate success
ratios over thresholds 18..30 (reference RL_Run_main.py:178-461).

Usage:
    python -m gnnra_tpu.harness.run_main --preset parity --checkpoint 10000 \
        --episodes 2000 --test-steps 100
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from gnnra_tpu.config import PRESETS
from gnnra_tpu.harness.train_main import build_agent
from gnnra_tpu.utils import plotting


def load_trained_model(agent, episode: int):
    """Reconstruct the checkpoint path from config and load both networks
    (reference RL_Run_main.py:106-149)."""
    agent.load_checkpoint(episode)
    return agent


def report(results) -> dict:
    """Printable summary with the reference's metric semantics
    (RL_Run_main.py:203-312, 443-461)."""
    summary = {}
    rl = results["expect_return"]
    ra = results["ra_expect_return"]
    summary["rl_wins_vs_ra"] = int((rl > ra).sum())
    summary["episodes"] = int(rl.shape[0])
    summary["avg_return_rl"] = float(rl.mean())
    summary["avg_return_ra"] = float(ra.mean())
    summary["avg_v2v_rate_rl"] = float(results["v2v_rate"].sum(-1).mean())
    summary["avg_v2v_rate_ra"] = float(results["ra_v2v_rate"].sum(-1).mean())
    summary["avg_v2i_rate_rl"] = float(results["v2i_rate"].sum(-1).mean())
    summary["avg_v2i_rate_ra"] = float(results["ra_v2i_rate"].sum(-1).mean())
    summary["avg_v2b_interference_rl"] = float(
        results["interference"].sum(-1).mean())
    summary["avg_v2b_interference_ra"] = float(
        results["ra_interference"].sum(-1).mean())
    if "opt_expect_return" in results:
        opt = results["opt_expect_return"]
        summary["avg_return_opt"] = float(opt.mean())
        summary["rl_optimality_ratio"] = float(rl.mean() / opt.mean())
    summary["v2i_success_ratio_rl"] = plotting.success_ratios(
        results["v2i_rate"])
    summary["v2i_success_ratio_ra"] = plotting.success_ratios(
        results["ra_v2i_rate"])
    return summary


def main(argv=None):
    from gnnra_tpu.utils import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--preset", default="parity", choices=sorted(PRESETS))
    parser.add_argument("--checkpoint", type=int, required=True,
                        help="training episode of the checkpoint to load")
    parser.add_argument("--episodes", type=int, default=None)
    parser.add_argument("--test-steps", type=int, default=None)
    parser.add_argument("--opt", action="store_true",
                        help="run the brute-force optimal baseline")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--results-base", default="results")
    parser.add_argument("--no-plots", action="store_true")
    parser.add_argument("--eps", action="store_true",
                        help="also save .eps figures (reference parity)")
    args = parser.parse_args(argv)

    agent = build_agent(args.preset, seed=args.seed,
                        results_base=args.results_base)
    load_trained_model(agent, args.checkpoint)
    results = agent.test_run(num_episodes=args.episodes,
                             num_test_steps=args.test_steps,
                             opt_flag=args.opt)
    summary = report(results)
    for k, v in summary.items():
        print(f"{k}: {v}")
    out = os.path.join(agent.results_dir, "test-results.npz")
    np.savez_compressed(out, **results)
    print(f"saved test results to {out}")
    if not args.no_plots:
        plotting.plot_test(results, agent.results_dir,
                           formats=("png", "eps") if args.eps
                           else ("png",))
    return results, summary


if __name__ == "__main__":
    main()
