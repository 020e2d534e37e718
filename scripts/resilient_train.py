"""Fault-tolerant full-scale training: supervisor + per-segment subprocess.

Trains the parity config to `total_episodes` in resumable segments. Each
segment runs in a fresh subprocess (a TPU backend failure poisons its
client process), resuming from the latest checkpoint; the supervisor retries
with backoff. The epsilon schedule stays pinned to the full horizon across
segments.

Usage: python scripts/resilient_train.py [total_episodes] [segment]
       python scripts/resilient_train.py --segment-worker total segment
"""

import dataclasses
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_segment(total: int, segment: int) -> int:
    """Worker: resume + train one segment. Exit 0 ok, 3 = already done."""
    import jax
    # persistent compile cache: each worker is a fresh process; without this
    # every segment pays the full remote compile again
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    from gnnra_tpu.config import parity_config
    from gnnra_tpu.harness import Agent

    cfg = parity_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, memory_capacity=200_000,
                                       save_model_interval=25))
    agent = Agent(cfg, results_base="results")
    done = agent.resume_latest()
    if done >= total:
        print(f"already trained {done} episodes", flush=True)
        return 3
    # a healthy worker keeps going (process warm-up costs minutes); the
    # per-segment checkpoint + part files still land, so a crash only
    # loses the current segment
    while done < total:
        todo = min(segment, total - done)
        print(f"segment: episodes {done} -> {done + todo}", flush=True)
        t0 = time.time()
        results = agent.train(num_episodes=todo, log_interval=100,
                              schedule_episodes=total, start_episode=done,
                              save_resume_state=True)
        dt = time.time() - t0
        print(f"segment done in {dt:.1f}s ({dt / todo * 1e3:.0f} ms/episode)",
              flush=True)
        part = os.path.join(agent.results_dir,
                            f"train-results-part-{done + todo}.npz")
        np.savez_compressed(part, **results)
        done += todo
    return 3


def supervise(total: int, segment: int):
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--segment-worker", str(total), str(segment)],
                timeout=3600)
        except subprocess.TimeoutExpired:
            print(f"[attempt {attempt}] segment hung >1h, killed; "
                  f"backing off 120s", flush=True)
            time.sleep(120)
            continue
        if proc.returncode == 3:
            print("training complete", flush=True)
            break
        if proc.returncode != 0:
            print(f"[attempt {attempt}] segment failed "
                  f"(rc={proc.returncode}); backing off 120s", flush=True)
            time.sleep(120)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--segment-worker":
        sys.exit(run_segment(int(sys.argv[2]), int(sys.argv[3])))
    total_eps = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    seg = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    supervise(total_eps, seg)
