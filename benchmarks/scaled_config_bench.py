"""Config-2 (scaled: 20 nodes/RBs, 4 GNN rounds, bf16) train-step bench.

Measures the widened model's full DQN train step on the real chip —
single-device, plus the GSPMD DP x TP program on a degenerate (1, 1) mesh
to confirm the TP-annotated program compiles and runs on TPU (true
multi-chip DP x TP numerics/performance are exercised on the virtual CPU
mesh: tests/test_pp_ep.py::TestTensorParallelWidened and
__graft_entry__.dryrun_multichip).

Usage: python benchmarks/scaled_config_bench.py [steps]
Prints one JSON line per measurement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gnnra_tpu.agent import dqn
    from gnnra_tpu.config import scaled_config
    from gnnra_tpu.env import vehicular
    from gnnra_tpu.parallel import mesh as mesh_lib, spmd

    cfg = scaled_config()
    env_cfg, model_cfg = cfg.env, cfg.model
    import dataclasses
    train_cfg = dataclasses.replace(cfg.train, memory_capacity=100_000)
    total = 1_000_000

    key = jax.random.PRNGKey(0)
    agent = dqn.init_agent(key, model_cfg, train_cfg)
    env_state = jax.jit(vehicular.new_random_game, static_argnums=1)(
        jax.random.PRNGKey(1), env_cfg)

    step = jax.jit(dqn.train_step, static_argnums=(3, 4, 5, 6),
                   donate_argnums=(0, 1))
    for i in range(20):      # warm dispatch path + compile
        agent, env_state, _, m = step(agent, env_state,
                                      jax.random.fold_in(key, 9000 + i),
                                      env_cfg, model_cfg, train_cfg, total)
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        agent, env_state, _, m = step(agent, env_state,
                                      jax.random.fold_in(key, i),
                                      env_cfg, model_cfg, train_cfg, total)
    float(m["loss"])         # scalar pull forces the serialized chain
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({"metric": "scaled_cfg2_train_steps_per_s",
                      "value": round(1.0 / dt, 3), "unit": "steps/s",
                      "vs_baseline": None}))

    # GSPMD DP x TP program on a (1, 1) mesh: compiles + runs on one chip
    mesh = mesh_lib.make_mesh((1, 1), ("data", "model"),
                              devices=jax.devices()[:1])
    agent2 = dqn.init_agent(jax.random.PRNGKey(2), model_cfg, train_cfg)
    # jit-wrapped: eager env construction poisons this runtime (CLAUDE.md)
    env_states = jax.jit(jax.vmap(
        lambda k: vehicular.new_random_game(k, env_cfg)))(
        jax.random.split(jax.random.PRNGKey(3), 1))
    agent2, env_states = spmd.shard_train_state(agent2, env_states, mesh)
    spmd_step = spmd.make_spmd_train_step(env_cfg, model_cfg, train_cfg,
                                          total, mesh=mesh)
    for i in range(10):
        agent2, env_states, _, m2 = spmd_step(agent2, env_states,
                                              jax.random.fold_in(key, i))
    float(m2["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        agent2, env_states, _, m2 = spmd_step(agent2, env_states,
                                              jax.random.fold_in(key, 50 + i))
    float(m2["loss"])
    dt2 = (time.perf_counter() - t0) / steps
    print(json.dumps({"metric": "scaled_cfg2_gspmd_train_steps_per_s",
                      "value": round(1.0 / dt2, 3), "unit": "steps/s",
                      "vs_baseline": round(dt / dt2, 3)}))


if __name__ == "__main__":
    main()
