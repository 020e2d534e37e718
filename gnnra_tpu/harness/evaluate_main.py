"""Checkpoint-history evaluation entry point
(reference RL_Evaluated_main_Epsilon_DiffTrails.py).

Walks every saved checkpoint (each `evaluation_episode_interval` training
episodes), evaluates the fixed-epsilon policy vs the Random-Action baseline
over several seeded trials, and plots mean +/- standard-error return bands —
the reproduction path for the paper's return-vs-training-episode curves.

Usage:
    python -m gnnra_tpu.harness.evaluate_main --preset parity \
        --episodes 10000 --trials 10 --fixed-epsilon 0.0
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from gnnra_tpu.config import PRESETS
from gnnra_tpu.harness.train_main import build_agent
from gnnra_tpu.utils import plotting


def main(argv=None):
    from gnnra_tpu.utils import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--preset", default="parity", choices=sorted(PRESETS))
    parser.add_argument("--episodes", type=int, default=None,
                        help="number of training episodes covered")
    parser.add_argument("--test-steps", type=int, default=None)
    parser.add_argument("--trials", type=int, default=None)
    parser.add_argument("--fixed-epsilon", type=float, default=0.0)
    parser.add_argument("--opt", action="store_true",
                        help="compute the brute-force ground truth at the "
                             "first checkpoint (reference episode-0 oracle)")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--results-base", default="results")
    parser.add_argument("--no-plots", action="store_true")
    parser.add_argument("--eps", action="store_true",
                        help="also save .eps figures (reference parity)")
    args = parser.parse_args(argv)

    agent = build_agent(args.preset, seed=args.seed,
                        results_base=args.results_base)
    results = agent.evaluate_training_diff_trials(
        num_episodes=args.episodes, num_test_steps=args.test_steps,
        opt_flag=args.opt, fixed_epsilon=args.fixed_epsilon,
        num_trials=args.trials)

    ret = results["evaluation_return_per_episode"]
    print(f"mean final-checkpoint return: {ret[:, -1].mean():.3f} "
          f"+/- {ret[:, -1].std():.3f}")
    print(f"mean RA return: {results['ra_expect_return'].mean():.3f}")
    if args.opt:
        print(f"optimal return (ground truth): "
              f"{results['opt_expect_return'].mean():.3f}")

    out = os.path.join(agent.results_dir, "evaluation-results.npz")
    np.savez_compressed(out, **results)
    print(f"saved evaluation results to {out}")
    if not args.no_plots:
        opt_ret = (float(results["opt_expect_return"].mean())
                   if args.opt else None)
        plotting.plot_evaluation(
            results, agent.results_dir,
            interval=agent.eval_cfg.evaluation_episode_interval,
            opt_return=opt_ret,
            formats=("png", "eps") if args.eps else ("png",))
    return results


if __name__ == "__main__":
    main()
