"""Artifact run: train the parity config and produce result curves +
checkpoints under results/ (driver-visible evidence of end-to-end training).

Usage: python scripts/train_artifact_run.py [episodes] [save_interval]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    episodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    save_interval = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    from gnnra_tpu.config import parity_config
    from gnnra_tpu.harness import Agent
    from gnnra_tpu.harness.train_main import save_train_results
    from gnnra_tpu.utils import plotting

    cfg = parity_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, memory_capacity=200_000,
                                       save_model_interval=save_interval))
    agent = Agent(cfg, results_base="results")
    t0 = time.time()
    results = agent.train(num_episodes=episodes, log_interval=100)
    dt = time.time() - t0
    print(f"trained {episodes} episodes in {dt:.1f}s "
          f"({dt / episodes * 1e3:.1f} ms/episode)")
    path = save_train_results(results, agent.results_dir)
    plotting.plot_training(results, agent.results_dir)
    print(f"results: {path}")

    # quick held-out comparison vs Random Action + Optimal
    test = agent.test_run(num_episodes=20, num_test_steps=50, opt_flag=True)
    rl = test["expect_return"].mean()
    ra = test["ra_expect_return"].mean()
    opt = test["opt_expect_return"].mean()
    print(f"test returns: RL {rl:.2f}  RA {ra:.2f}  Opt {opt:.2f}  "
          f"RL/Opt {rl / opt:.3f}  wins-vs-RA "
          f"{int((test['expect_return'] > test['ra_expect_return']).sum())}/20")
    np.savez_compressed(os.path.join(agent.results_dir, "test-results.npz"),
                        **test)


if __name__ == "__main__":
    main()
