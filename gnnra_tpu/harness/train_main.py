"""Training entry point (reference RL_Train_main.py).

Builds the environment + agent for a named config preset, trains, saves
result arrays (.npz instead of pickle) and plots. CLI replaces the
reference's edit-the-source constants (RL_Train_main.py:26-38).

Usage:
    python -m gnnra_tpu.harness.train_main --preset parity --episodes 10000
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np

from gnnra_tpu.config import PRESETS
from gnnra_tpu.harness.agent import Agent
from gnnra_tpu.utils import plotting


def build_agent(preset: str, episodes=None, batch_size=None, gamma=None,
                v2i_weight=None, seed=None, results_base="results") -> Agent:
    run_cfg = PRESETS[preset]()
    tc = run_cfg.train
    overrides = {}
    if episodes is not None:
        overrides["num_episodes"] = episodes
    if batch_size is not None:
        overrides["batch_size"] = batch_size
    if gamma is not None:
        overrides["gamma"] = gamma
    if v2i_weight is not None:
        overrides["v2i_weight"] = v2i_weight
    if seed is not None:
        overrides["seed"] = seed
    if overrides:
        tc = dataclasses.replace(tc, **overrides)
        run_cfg = dataclasses.replace(run_cfg, train=tc)
    return Agent(run_cfg, results_base=results_base)


def save_train_results(results, out_dir: str) -> str:
    """Persist the training metric arrays (reference pickles at
    RL_Train_main.py:150-157; we use a portable .npz)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "train-results.npz")
    np.savez_compressed(path, **results)
    return path


def main(argv=None):
    from gnnra_tpu.utils import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--preset", default="parity", choices=sorted(PRESETS))
    parser.add_argument("--episodes", type=int, default=None)
    parser.add_argument("--train-steps", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--gamma", type=float, default=None)
    parser.add_argument("--v2i-weight", type=float, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--results-base", default="results")
    parser.add_argument("--no-plots", action="store_true")
    parser.add_argument("--eps", action="store_true",
                        help="also save .eps figures (reference parity)")
    args = parser.parse_args(argv)

    agent = build_agent(args.preset, args.episodes, args.batch_size,
                        args.gamma, args.v2i_weight, args.seed,
                        args.results_base)
    results = agent.train(num_episodes=args.episodes,
                          num_train_steps=args.train_steps)
    path = save_train_results(results, agent.results_dir)
    print(f"saved training results to {path}")
    if not args.no_plots:
        plotting.plot_training(results, agent.results_dir,
                               formats=("png", "eps") if args.eps
                               else ("png",))
    return results


if __name__ == "__main__":
    main()
