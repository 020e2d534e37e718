"""Reference-scale evaluation artifact: train with every-5-episode
checkpoints, then score the FULL checkpoint history over multiple trials
and commit the mean +/- standard-error return curves into docs/results/.

Reproduces the reference's headline output — the return-vs-training-episode
curve of RL_Evaluated_main_Epsilon_DiffTrails.py:331-369 /
BS_brain.py:1164-1451 (trials x every-5-episode checkpoints, fixed epsilon
0, RA baseline, episode-0 brute-force Optimal ground truth) — using the
on-device vmapped checkpoint-bank evaluator instead of the reference's
20,000 .h5-load host loop.

Usage: python scripts/evaluation_artifact_run.py [episodes] [trials] [steps]
       [results_base]
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "docs", "results")


def main():
    episodes = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    results_base = sys.argv[4] if len(sys.argv) > 4 else "results"

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gnnra_tpu.config import parity_config
    from gnnra_tpu.harness import Agent
    from gnnra_tpu.utils import plotting

    cfg = parity_config()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, memory_capacity=200_000,
                                  save_model_interval=5),
        eval=dataclasses.replace(cfg.eval, num_trials=trials,
                                 num_test_steps=steps,
                                 evaluation_episode_interval=5))
    agent = Agent(cfg, results_base=results_base)

    done = agent.resume_latest()
    if done < episodes:
        t0 = time.time()
        results = agent.train(num_episodes=episodes - done, log_interval=200,
                              resume_interval=1000,
                              schedule_episodes=episodes, start_episode=done,
                              save_resume_state=True)
        dt = time.time() - t0
        print(f"trained {episodes - done} episodes in {dt:.1f}s "
              f"({dt / max(1, episodes - done) * 1e3:.1f} ms/episode)",
              flush=True)
        os.makedirs(OUT_DIR, exist_ok=True)
        plotting.plot_training(results, OUT_DIR)
        np.savez_compressed(
            os.path.join(agent.results_dir, "train-results.npz"), **results)
    else:
        print(f"training already complete at {done} episodes", flush=True)

    t0 = time.time()
    ev = agent.evaluate_training_diff_trials(
        num_episodes=episodes, num_test_steps=steps, opt_flag=True,
        fixed_epsilon=0.0, num_trials=trials, ckpt_chunk=200)
    dt = time.time() - t0
    n_ckpts = ev["evaluation_return_per_episode"].shape[1]
    print(f"evaluated {trials} trials x {n_ckpts} checkpoints x {steps} "
          f"steps in {dt:.1f}s", flush=True)

    os.makedirs(OUT_DIR, exist_ok=True)
    np.savez_compressed(os.path.join(OUT_DIR, "evaluation-results.npz"), **ev)
    plotting.plot_evaluation(
        ev, OUT_DIR, interval=5,
        opt_return=float(ev["opt_expect_return"].mean()))
    ret = ev["evaluation_return_per_episode"]
    ra = ev["ra_expect_return"]
    print(f"final-checkpoint return: RL {ret[:, -1].mean():.2f} "
          f"+/- {ret[:, -1].std():.2f}  RA {ra[:, -1].mean():.2f}  "
          f"Opt {ev['opt_expect_return'].mean():.2f}", flush=True)
    print(f"curves: {OUT_DIR}/evaluation-return.png", flush=True)


if __name__ == "__main__":
    main()
