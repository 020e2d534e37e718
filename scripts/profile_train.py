"""Capture a device profile of the production training path.

Produces a perfetto/XProf-compatible trace of `dqn.train_episodes` (the
episode-fused program every training driver uses) — the observability the
reference entirely lacks (its only instrumentation is wall-clock prints,
BS_brain.py:774-775, 813-816).

Usage: python scripts/profile_train.py [out_dir] [num_chunks]
Open the resulting trace directory with XProf / ui.perfetto.dev.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gnnra_tpu.agent import dqn
from gnnra_tpu.config import EnvConfig, ModelConfig, TrainConfig
from gnnra_tpu.utils import profiling


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gnnra-trace"
    num_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    env_cfg, model_cfg = EnvConfig(), ModelConfig()
    train_cfg = TrainConfig(memory_capacity=100_000)
    key = jax.random.PRNGKey(0)
    agent = dqn.init_agent(key, model_cfg, train_cfg)

    fn = jax.jit(dqn.train_episodes, static_argnums=(2, 3, 4, 5, 6, 7, 8),
                 donate_argnums=(0,))
    # warm up / compile outside the trace so the capture shows steady state
    for i in range(3):
        agent, packed = fn(agent, jax.random.fold_in(key, i), env_cfg,
                           model_cfg, train_cfg, 5, train_cfg.num_train_steps,
                           10_000_000)
    jax.block_until_ready(packed)

    with profiling.trace(out_dir):
        for i in range(num_chunks):
            agent, packed = fn(agent, jax.random.fold_in(key, 100 + i),
                               env_cfg, model_cfg, train_cfg, 5,
                               train_cfg.num_train_steps, 10_000_000)
        jax.block_until_ready(packed)

    n_files = sum(len(fs) for _, _, fs in os.walk(out_dir))
    print(f"trace captured: {out_dir} ({n_files} files); "
          f"open with XProf / perfetto")


if __name__ == "__main__":
    main()
