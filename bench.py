"""Benchmark: DQN training throughput on the flagship parity config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric: full DQN train steps/s — one step = 50 epsilon-greedy env
transitions (rollout burst) + one batch-512 replay update + target-sync
check, i.e. exactly the reference's per-train-step workload
(BS_brain.py:758,818-847). Measured on the production training path
(`dqn.train_episodes`: a multi-episode chunk — fresh env per episode +
scanned train steps — as ONE device program, the architecture every
training driver in this repo uses). The single-step-per-dispatch time is
also reported on stderr; on a tunnel-attached runtime it is dominated by
dispatch latency, which the episode-fused path amortizes away.

vs_baseline: speedup over a "reference-architecture" proxy that performs the
same workload the way the reference does — a host Python loop issuing one
single-sample forward + one env step per transition (50 host<->device round
trips, BS_brain.py:431-512) followed by a separate batched update — but with
every piece individually jit-compiled. This is *generous* to the baseline:
the actual reference adds Keras/TF1 per-call overhead and a Python-scalar
channel simulator on top.
"""

import json
import sys
import time

import jax



def time_fn(fn, n_iters, *args):
    fn(*args)  # warmup / compile
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iters


def main():
    from gnnra_tpu.agent import dqn, policy
    from gnnra_tpu.config import EnvConfig, ModelConfig, TrainConfig
    from gnnra_tpu.env import features, vehicular
    from gnnra_tpu.models import gnn_dqn

    env_cfg = EnvConfig()
    model_cfg = ModelConfig()
    train_cfg = TrainConfig(memory_capacity=100_000)
    total_steps = 10_000_000

    key = jax.random.PRNGKey(0)
    agent = dqn.init_agent(key, model_cfg, train_cfg)
    env_state = vehicular.new_random_game(jax.random.PRNGKey(1), env_cfg)

    # --- fused TPU-native train step -------------------------------------
    step = jax.jit(dqn.train_step, static_argnums=(3, 4, 5, 6),
                   donate_argnums=(0, 1))

    def run_step(agent, env_state, k):
        a, e, _, m = step(agent, env_state, k, env_cfg, model_cfg, train_cfg,
                          total_steps)
        return a, e, m["loss"]

    # warmup (compiles, fills replay, and warms the runtime dispatch path —
    # the first ~20 dispatches can be an order of magnitude slower)
    for i in range(25):
        agent, env_state, loss = run_step(agent, env_state,
                                          jax.random.fold_in(key, 1000 + i))
    jax.block_until_ready(loss)
    n_iters = 100
    t0 = time.perf_counter()
    for i in range(n_iters):
        agent, env_state, loss = run_step(agent, env_state,
                                          jax.random.fold_in(key, i))
    jax.block_until_ready(loss)
    fused_step_time = (time.perf_counter() - t0) / n_iters
    fused_steps_per_s = 1.0 / fused_step_time

    # --- production path: episode-fused chunks ---------------------------
    # One dispatch = `chunk` episodes x `steps_per_episode` train steps
    # (fresh env per episode, scanned steps, packed metrics) — the
    # architecture harness.Agent.train and the training scripts execute.
    # The chunk is NOT bounded by the reference's every-5-episode
    # checkpoint cadence (BS_brain.py:791): dqn.train_episodes_snapshots
    # emits in-chunk (params, target, env_step) snapshots every 5 episodes
    # and the host writes checkpoints from those. The timed loop includes
    # pulling the packed metrics AND all snapshot weights to host, exactly
    # like the harness. The agent is donated and carried call-to-call, so
    # the timing chain is a serialized dependency chain (no dispatch
    # elision, CLAUDE.md).
    chunk, steps_per_episode = train_cfg.episode_chunk, \
        train_cfg.num_train_steps
    snap_every = train_cfg.save_model_interval
    episodes_fn = jax.jit(
        dqn.train_episodes_snapshots,
        static_argnums=(2, 3, 4, 5, 6, 7, 8, 9), donate_argnums=(0,))
    for i in range(10):   # warm dispatch path
        agent, packed, snaps = episodes_fn(
            agent, jax.random.fold_in(key, 3000 + i), env_cfg, model_cfg,
            train_cfg, chunk, steps_per_episode, total_steps, snap_every)
        jax.device_get((packed, snaps))
    n_chunks = 10
    t0 = time.perf_counter()
    for i in range(n_chunks):
        agent, packed, snaps = episodes_fn(
            agent, jax.random.fold_in(key, 4000 + i), env_cfg, model_cfg,
            train_cfg, chunk, steps_per_episode, total_steps, snap_every)
        jax.device_get((packed, snaps))
    jax.block_until_ready(packed)
    prod_step_time = ((time.perf_counter() - t0)
                      / (n_chunks * chunk * steps_per_episode))
    prod_steps_per_s = 1.0 / prod_step_time

    # --- reference-architecture proxy ------------------------------------
    # host loop: per transition one single-sample predict + one env step
    # (50 dispatches), then one batched replay update — the reference's
    # host<->device pattern (BS_brain.py:336,366-376,728) with jitted parts.
    fwd = jax.jit(
        lambda p, n, e, a: gnn_dqn.apply_single(p, n, e, a, model_cfg))
    feat = jax.jit(lambda s: (features.node_edge_features(s, env_cfg),
                              features.adjacency(s, env_cfg)))
    env_step = jax.jit(vehicular.act, static_argnums=3)
    upd = jax.jit(lambda ag, k: dqn.replay_update(ag, k, model_cfg,
                                                  train_cfg),
                  static_argnums=())

    def proxy_step(agent, env_state, k):
        for t in range(train_cfg.transitions_per_step):
            kt = jax.random.fold_in(k, t)
            (node, edge), adj = feat(env_state)
            q = fwd(agent.params, node, edge, adj)
            actions = policy.greedy_actions(q)
            env_state, v2v, v2i, _ = env_step(env_state, actions[:, None],
                                              kt, env_cfg)
        agent2, m = upd(agent, k)
        return agent2, env_state, m["loss"]

    # warmup
    for i in range(3):
        _, env_state, l0 = proxy_step(agent, env_state,
                                      jax.random.fold_in(key, 2000 + i))
    jax.block_until_ready(l0)
    n_proxy = 5
    t0 = time.perf_counter()
    for i in range(n_proxy):
        _, env_state, l0 = proxy_step(agent, env_state,
                                      jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(l0)
    proxy_step_time = (time.perf_counter() - t0) / n_proxy
    proxy_steps_per_s = 1.0 / proxy_step_time

    vs_baseline = prod_steps_per_s / proxy_steps_per_s
    print(f"episode-fused (production): {prod_step_time*1e6:.1f} us/step "
          f"({prod_steps_per_s:.0f} steps/s); single-step dispatch: "
          f"{fused_step_time*1e3:.2f} ms/step "
          f"({fused_steps_per_s:.2f} steps/s); proxy host-loop: "
          f"{proxy_step_time*1e3:.2f} ms/step "
          f"({proxy_steps_per_s:.2f} steps/s)", file=sys.stderr)
    print(json.dumps({
        "metric": "dqn_train_steps_per_s",
        "value": round(prod_steps_per_s, 3),
        "unit": "steps/s",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
