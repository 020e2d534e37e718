"""Config-3 (256-env) train-step decomposition (round-4 item 5).

Round 3 measured 62.2 steps/s = ~800k transitions/s for the batched-env
config and asserted "throughput-bound" without saying what it is bound BY.
This bench times the full step (the `train_episode` num_envs>1 body: one
scan-free batched rollout + one batch-512 replay update + cond target
sync) and then each phase in isolation:

  chan     vmapped `precompute_channel_trajectory` (mobility + AR(1)
           shadowing + fading + pathloss for all T steps of all E envs)
  feat     node/edge featurization over the [E, T+1] stacked states
  forward  ONE batched policy forward on [T*E, N, ...] + eps-greedy
  reward   vmapped reward engine over [T, E]
  add      replay ring batch append (T*E rows)
  update   batch-512 replay update (fwd+bwd+Adam)

Each phase runs in its own serialized fori_loop chain whose input is
perturbed by the carry (otherwise XLA hoists the loop-invariant phase out
of the loop) and is forced by a scalar pull. Phase sums can exceed the
full step (XLA overlaps/fuses across phases in the real program);
the split still shows where the time IS. Reference anchor: the batched
analog of BS_brain.py:409-553 + 555-748.

Usage: python benchmarks/batched_decompose_bench.py [--envs E] [--iters I]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def chain(fn, iters):
    """Time fn (scalar -> scalar, closing over inputs) in a serialized
    jitted fori_loop with forced execution; adaptive iteration floor,
    min-of-k sampling and two-point slope (spmm_bench.bench discipline —
    per-call round-trip noise is several ms and session-varying)."""
    @jax.jit
    def loop(s, n):
        def body(_, s):
            return s + fn(s) * 1e-9
        return jax.lax.fori_loop(0, n, body, s)

    def timed(s, n):
        t0 = time.perf_counter()
        s = loop(s, n)
        float(s)
        return time.perf_counter() - t0, s

    s = loop(jnp.float32(0.0), iters)
    float(s)
    t1, s = timed(s, iters)
    while t1 < 0.2 and iters < 1 << 16:
        iters *= 4
        t1, s = timed(s, iters)
    t_n, t_2n = t1, None
    for _ in range(2):
        t, s = timed(s, iters)
        t_n = min(t_n, t)
    for _ in range(3):
        t, s = timed(s, 2 * iters)
        t_2n = t if t_2n is None else min(t_2n, t)
    if t_2n <= t_n:
        return t_n / iters
    return (t_2n - t_n) / iters


def report(name, seconds, full=None):
    rec = {"metric": f"batched_phase_{name}",
           "value": round(seconds * 1e3, 3), "unit": "ms",
           "vs_baseline": (round(seconds / full, 3) if full else 1.0)}
    print(json.dumps(rec) +
          (f"  # {seconds / full:.0%} of full step" if full else ""),
          flush=True)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--envs", type=int, default=256)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gnnra_tpu.agent import dqn, policy, replay as replay_lib
    from gnnra_tpu.config import EnvConfig, ModelConfig, TrainConfig
    from gnnra_tpu.env import features, vehicular
    from gnnra_tpu.models import gnn_dqn

    env_cfg = EnvConfig()
    model_cfg = ModelConfig()
    # capacity rounded to a burst multiple -> cond-free DUS ring append
    burst = TrainConfig().transitions_per_step * args.envs
    train_cfg = TrainConfig(num_envs=args.envs,
                            memory_capacity=-(-200_000 // burst) * burst)
    n_envs = args.envs
    t_steps = train_cfg.transitions_per_step
    total = 10_000_000

    key = jax.random.PRNGKey(0)
    agent = dqn.init_agent(key, model_cfg, train_cfg)
    env_states = jax.jit(
        lambda k: jax.vmap(
            lambda kk: vehicular.new_random_game(kk, env_cfg))(
                jax.random.split(k, n_envs)))(jax.random.PRNGKey(1))

    # ---- full step baseline: the production scanned-episode program ------
    ep_fn = jax.jit(dqn.train_episode, static_argnums=(2, 3, 4, 5, 6, 7),
                    donate_argnums=(0,))
    # warm dispatches (CLAUDE.md: first ~20 tunnel dispatches are slow)
    tiny = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((8,))
    for _ in range(25):
        x = tiny(x)
    jax.block_until_ready(x)
    for i in range(2):
        agent, rewards, metrics = ep_fn(
            agent, jax.random.fold_in(key, 100 + i), env_cfg, model_cfg,
            train_cfg, args.iters, total, n_envs)
        jax.device_get(metrics["loss_per_head"])
    t0 = time.perf_counter()
    agent, rewards, metrics = ep_fn(
        agent, jax.random.fold_in(key, 200), env_cfg, model_cfg,
        train_cfg, args.iters, total, n_envs)
    jax.device_get(metrics["loss_per_head"])
    full = (time.perf_counter() - t0) / args.iters
    print(json.dumps({"metric": "batched_full_step",
                      "value": round(1.0 / full, 1), "unit": "steps/s",
                      "vs_baseline": round(full * 1e3, 2)}) +
          f"  # {full * 1e3:.2f} ms/step, "
          f"{t_steps * n_envs / full / 1e3:.0f}k transitions/s", flush=True)

    # ---- phase inputs (computed once, eagerly) ---------------------------
    def perturb(tree, s):
        # EVERY float leaf moves with the carry: if the perturbation fed
        # only one (possibly unused) leaf, XLA hoists the whole phase out
        # of the timing loop as loop-invariant and the phase measures ~0
        return jax.tree.map(
            lambda l: l + s.astype(l.dtype) * 1e-12
            if jnp.issubdtype(l.dtype, jnp.floating) else l, tree)

    kc = jax.random.split(jax.random.PRNGKey(2), n_envs)
    chan_fn = jax.jit(lambda es: jax.vmap(
        lambda st, k: vehicular.precompute_channel_trajectory(
            st, k, env_cfg, t_steps))(es, kc))
    chan = chan_fn(env_states)
    stacked = jax.jit(lambda es, c: jax.vmap(
        lambda s, cc: dqn._stacked_rollout_states(s, cc, env_cfg))(es, c))(
            env_states, chan)

    report("chan", chain(
        lambda s: jax.tree.leaves(chan_fn(perturb(env_states, s)))[0]
        .ravel()[0], args.iters), full)

    feat_fn = jax.jit(lambda st: jax.vmap(jax.vmap(
        lambda s: features.node_edge_features(s, env_cfg)))(st))
    report("feat", chain(
        lambda s: feat_fn(perturb(stacked, s))[0].ravel()[0],
        args.iters), full)

    node_all, edge_all = feat_fn(stacked)
    adj = jax.jit(lambda es: jax.vmap(
        lambda s: features.adjacency(s, env_cfg))(es))(env_states)
    n_nodes = node_all.shape[2]
    node_b = node_all[:, :t_steps].reshape(t_steps * n_envs, n_nodes, -1)
    edge_b = edge_all[:, :t_steps].reshape(t_steps * n_envs, n_nodes, -1)
    adj_b = jnp.broadcast_to(adj[:, None], (n_envs, t_steps) + adj.shape[1:]
                             ).reshape(t_steps * n_envs, n_nodes, n_nodes)

    def fwd_phase(s):
        q = gnn_dqn.apply(agent.params, node_b + s * 1e-12, edge_b, adj_b,
                          model_cfg)
        keys = jax.random.split(jax.random.PRNGKey(3), q.shape[0])
        actions, _ = jax.vmap(policy.epsilon_greedy,
                              in_axes=(0, 0, None))(keys, q, 0.5)
        return q.ravel()[0] + actions.ravel()[0] * 1e-9
    report("forward", chain(fwd_phase, args.iters), full)

    actions = jax.jit(lambda: jax.random.randint(
        jax.random.PRNGKey(4), (t_steps, n_envs, n_nodes), 0,
        env_cfg.n_rb))()
    acting = jax.tree.map(lambda x: jnp.swapaxes(x[:, :t_steps], 0, 1),
                          stacked)

    def reward_phase(s):
        v2v, v2i, _ = jax.vmap(jax.vmap(
            lambda st, a: vehicular.compute_reward_with_channel_selection(
                st, a[:, None], env_cfg)))(perturb(acting, s), actions)
        return v2v.ravel()[0]
    report("reward", chain(reward_phase, args.iters), full)

    flat_traj = jax.jit(lambda: tuple(jax.tree.map(
        lambda x: x.reshape((t_steps * n_envs,) + x.shape[2:]),
        (jnp.swapaxes(node_all[:, :t_steps], 0, 1),
         jnp.swapaxes(edge_all[:, :t_steps], 0, 1),
         jnp.broadcast_to(adj[None], (t_steps,) + adj.shape),
         jnp.swapaxes(actions, 0, 1) if False else actions,
         jnp.zeros((t_steps, n_envs)),
         jnp.swapaxes(node_all[:, 1:], 0, 1),
         jnp.swapaxes(edge_all[:, 1:], 0, 1)))))()

    def add_phase(s):
        rep = replay_lib.add_batch(agent.replay,
                                   *perturb(flat_traj, s))
        return rep.data.ravel()[0] if hasattr(rep, "data") else \
            jax.tree.leaves(rep)[0].ravel()[0]
    report("add", chain(add_phase, args.iters), full)

    def update_phase(s):
        ag = agent.replace(params=perturb(agent.params, s))
        _, m = dqn.replay_update(ag, jax.random.PRNGKey(5), model_cfg,
                                 train_cfg)
        return m["loss_per_head"].ravel()[0]
    report("update", chain(update_phase, args.iters), full)


if __name__ == "__main__":
    main()
