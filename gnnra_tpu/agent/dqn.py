"""Jitted DQN core: rollout bursts, Bellman targets, one-step Adam updates.

Re-designs the reference's host-driven loop (`Agent.generate_d2d_transition`
+ `Agent.replay`, BS_brain.py:409-748) — which crosses the host<->device
boundary for every single-sample predict and every fit — as two fused device
programs:

  * `rollout`: `lax.scan` over `transitions_per_step` env transitions with
    epsilon-greedy actions computed from an in-graph forward pass, writing
    straight into the device-resident replay ring.
  * `replay_update`: sample a batch, forward online+target nets, build the
    Bellman targets y[a] = r + gamma*max Q_target(s') with the shared global
    reward (BS_brain.py:670-692), Huber loss summed over heads, one Adam
    step (Adam(1e-3, beta1=0.5), BS_brain.py:212-214).

`train_step` = rollout + replay_update + conditional target sync (every 500
env steps, BS_brain.py:275,846-847); the whole thing compiles to a single XLA
program per episode loop iteration.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from gnnra_tpu.config import EnvConfig, ModelConfig, TrainConfig
from gnnra_tpu.env import features, vehicular
from gnnra_tpu.models import gnn_dqn
from gnnra_tpu.ops import losses, optim
from gnnra_tpu.agent import policy, replay as replay_lib


class AgentState(struct.PyTreeNode):
    """Everything the learner owns, all device-resident."""

    params: Any                 # online Q-network
    target_params: Any          # target network
    opt_state: Any
    replay: replay_lib.ReplayState
    env_step: jax.Array         # [] int32, counts env transitions (num_step)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam(1e-3, beta1=0.5) per the reference compile (BS_brain.py:212-214).
    Default 'keras_adam' matches keras's exact update rule (ops/optim.py),
    verified step-for-step against tests/golden/golden_model.npz."""
    if cfg.optimizer == "keras_adam":
        return optim.keras_adam(cfg.learning_rate, b1=cfg.adam_beta1,
                                b2=cfg.adam_beta2, eps=cfg.adam_eps)
    return optax.adam(cfg.learning_rate, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                      eps=cfg.adam_eps)


def init_agent(key: jax.Array, model_cfg: ModelConfig,
               train_cfg: TrainConfig) -> AgentState:
    k_online, k_target = jax.random.split(key)
    params = gnn_dqn.init_params(k_online, model_cfg)
    # The reference builds two independently-initialized models
    # (BS_brain.py:105-106); the first target sync at num_step==500 aligns
    # them. We mirror that: independent init.
    target_params = gnn_dqn.init_params(k_target, model_cfg)
    opt_state = make_optimizer(train_cfg).init(params)
    return AgentState(params=params, target_params=target_params,
                      opt_state=opt_state,
                      replay=replay_lib.init(model_cfg, train_cfg.memory_capacity),
                      env_step=jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# Rollout
# ---------------------------------------------------------------------------

def _weighted_reward(v2v_rate, v2i_rate, cfg: TrainConfig):
    """Shared global reward (reference BS_brain.py:513-517)."""
    return (cfg.v2v_weight * jnp.sum(v2v_rate) / cfg.v2v_rate_max
            + cfg.v2i_weight * jnp.sum(v2i_rate))


def rollout(agent: AgentState, env_state: vehicular.EnvState, key: jax.Array,
            env_cfg: EnvConfig, model_cfg: ModelConfig, train_cfg: TrainConfig,
            total_env_steps: int
            ) -> Tuple[AgentState, vehicular.EnvState, jax.Array]:
    """Generate `transitions_per_step` transitions into replay.

    Mirrors `generate_d2d_transition` (BS_brain.py:409-553): featurize,
    epsilon-greedy action, env act (reward + world advance), featurize next
    state, store (S, A, R, S') with the adjacency shared between S and S'.

    The action-independent env work (mobility, shadowing, fading, pathloss —
    everything `act` does except reward + interference obs) is hoisted into
    ONE batched `precompute_channel_trajectory` call; the serial scan keeps
    only featurize -> forward -> action -> reward -> obs. Same per-step math,
    different (batched) PRNG stream alignment — equal in distribution.

    Returns (agent', env_state', reward_per_transition [T]).
    """
    k_traj, k_scan = jax.random.split(key)
    chan = vehicular.precompute_channel_trajectory(
        env_state, k_traj, env_cfg, train_cfg.transitions_per_step)

    def body(carry, xs):
        env_state, env_step = carry
        k_act, chan_t = xs
        node, edge = features.node_edge_features(env_state, env_cfg)
        adj = features.adjacency(env_state, env_cfg)
        q = gnn_dqn.apply_single(agent.params, node, edge, adj, model_cfg)
        eps = policy.epsilon_at(env_step, total_env_steps, train_cfg)
        actions, _ = policy.epsilon_greedy(k_act, q, eps)
        env_state, v2v_rate, v2i_rate, _ = vehicular.apply_precomputed_transition(
            env_state, chan_t, actions[:, None], env_cfg)
        reward = _weighted_reward(v2v_rate, v2i_rate, train_cfg)
        next_node, next_edge = features.node_edge_features(env_state, env_cfg)
        traj = (node, edge, adj, actions, reward, next_node, next_edge)
        return (env_state, env_step + 1), traj

    keys = jax.random.split(k_scan, train_cfg.transitions_per_step)
    (env_state, env_step), traj = jax.lax.scan(
        body, (env_state, agent.env_step), (keys, chan))
    rep = replay_lib.add_batch(agent.replay, *traj)
    rewards = traj[4]
    return agent.replace(replay=rep, env_step=env_step), env_state, rewards


def _stacked_rollout_states(env_state: vehicular.EnvState,
                            chan: vehicular.ChannelTrajectory,
                            env_cfg: EnvConfig) -> vehicular.EnvState:
    """EnvState pytree with a leading [T+1] axis: entry 0 is `env_state`,
    entry t>=1 carries trajectory entry t-1's channels plus the
    (action-independent, see `rollout_parallel`) interference observation
    recomputed for those channels."""
    t_steps = chan.positions.shape[0]

    def cat(first, rest):
        return jnp.concatenate([first[None], rest], axis=0)

    def bc(x):
        return jnp.broadcast_to(x[None], (t_steps + 1,) + x.shape)

    stacked = vehicular.EnvState(
        positions=cat(env_state.positions, chan.positions),
        directions=cat(env_state.directions, chan.directions),
        velocities=bc(env_state.velocities),
        shadow_v2v=cat(env_state.shadow_v2v, chan.shadow_v2v),
        shadow_v2i=cat(env_state.shadow_v2i, chan.shadow_v2i),
        v2v_abs=cat(env_state.v2v_abs, chan.v2v_abs),
        v2i_abs=cat(env_state.v2i_abs, chan.v2i_abs),
        v2v_fast=cat(env_state.v2v_fast, chan.v2v_fast),
        v2i_fast=cat(env_state.v2i_fast, chan.v2i_fast),
        destinations=bc(env_state.destinations),
        activate_links=bc(env_state.activate_links),
        v2v_interference_db=bc(env_state.v2v_interference_db),  # placeholder
        step=env_state.step + jnp.arange(t_steps + 1, dtype=jnp.int32),
    )
    dummy_actions = jnp.zeros_like(env_state.destinations)
    obs_rest = jax.vmap(
        lambda s: vehicular.compute_interference_obs(s, dummy_actions,
                                                     env_cfg)
    )(jax.tree.map(lambda x: x[1:], stacked))
    obs_all = jnp.concatenate(
        [env_state.v2v_interference_db[None], obs_rest], axis=0)
    return stacked.replace(v2v_interference_db=obs_all)


def rollout_parallel(agent: AgentState, env_state: vehicular.EnvState,
                     key: jax.Array, env_cfg: EnvConfig,
                     model_cfg: ModelConfig, train_cfg: TrainConfig,
                     total_env_steps: int
                     ) -> Tuple[AgentState, vehicular.EnvState, jax.Array]:
    """Scan-free rollout: the whole burst as batched computations.

    In the reference's MDP, actions influence ONLY rewards — never the next
    state: mobility/shadowing/fading are action-independent
    (BS_brain.py:366-376), and the interference observation's V2V
    accumulation is dead code for active links (the guard at
    Environment.py:486), leaving only the action-independent V2I term.
    With `activate_links` all-True (always, in training — nothing ever
    deactivates links), every state of the burst is therefore known up
    front, so featurization runs once over [T+1] states, all T policy
    forwards run as ONE batched forward, and rewards/epsilon-greedy draws
    vmap over steps. Consuming the same per-step action keys as `rollout`,
    the produced trajectory is IDENTICAL (asserted in tests) at a fraction
    of the serial-scan cost.
    """
    t_steps = train_cfg.transitions_per_step
    k_traj, k_scan = jax.random.split(key)
    chan = vehicular.precompute_channel_trajectory(env_state, k_traj,
                                                   env_cfg, t_steps)
    stacked = _stacked_rollout_states(env_state, chan, env_cfg)

    node_all, edge_all = jax.vmap(
        lambda s: features.node_edge_features(s, env_cfg))(stacked)
    # destinations are fixed within an episode -> adjacency is constant
    adj = features.adjacency(env_state, env_cfg)

    node = node_all[:t_steps]
    edge = edge_all[:t_steps]
    q = gnn_dqn.apply(agent.params, node, edge,
                      jnp.broadcast_to(adj, (t_steps,) + adj.shape),
                      model_cfg)                               # [T, N, A]
    eps = jax.vmap(lambda t: policy.epsilon_at(
        agent.env_step + t, total_env_steps, train_cfg))(
            jnp.arange(t_steps))
    keys = jax.random.split(k_scan, t_steps)
    actions, _ = jax.vmap(policy.epsilon_greedy)(keys, q, eps)  # [T, N]

    acting = jax.tree.map(lambda x: x[:t_steps], stacked)
    v2v_rate, v2i_rate, _ = jax.vmap(
        lambda s, a: vehicular.compute_reward_with_channel_selection(
            s, a[:, None], env_cfg))(acting, actions)
    rewards = jax.vmap(
        lambda v, i: _weighted_reward(v, i, train_cfg))(v2v_rate, v2i_rate)

    adj_b = jnp.broadcast_to(adj, (t_steps,) + adj.shape)
    rep = replay_lib.add_batch(agent.replay, node, edge, adj_b, actions,
                               rewards, node_all[1:], edge_all[1:])
    final_state = jax.tree.map(lambda x: x[-1], stacked)
    return (agent.replace(replay=rep, env_step=agent.env_step + t_steps),
            final_state, rewards)


def rollout_batched(agent: AgentState, env_states: vehicular.EnvState,
                    key: jax.Array, env_cfg: EnvConfig,
                    model_cfg: ModelConfig, train_cfg: TrainConfig,
                    total_env_steps: int
                    ) -> Tuple[AgentState, vehicular.EnvState, jax.Array]:
    """Vectorized rollout over E parallel environments (config 3).

    Each scan step advances every env with its own epsilon-greedy action from
    one batched forward pass (E is just the batch axis of the model), then
    all E transitions are appended to the replay ring. env_step advances by 1
    per scan step so the epsilon schedule matches the single-env reference.

    Args:
      env_states: EnvState pytree with a leading [E] axis.
    Returns (agent', env_states', rewards [T, E]).
    """
    k_traj, k_scan = jax.random.split(key)
    n_envs = jax.tree.leaves(env_states)[0].shape[0]
    # [E, T, ...] per-env trajectories -> transpose to [T, E, ...] so the
    # scan consumes one time slice across all envs per step.
    chan = jax.vmap(lambda s, k: vehicular.precompute_channel_trajectory(
        s, k, env_cfg, train_cfg.transitions_per_step))(
            env_states, jax.random.split(k_traj, n_envs))
    chan = jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), chan)

    def body(carry, xs):
        env_states, env_step = carry
        k, chan_t = xs
        node, edge = jax.vmap(
            lambda s: features.node_edge_features(s, env_cfg))(env_states)
        adj = jax.vmap(lambda s: features.adjacency(s, env_cfg))(env_states)
        q = gnn_dqn.apply(agent.params, node, edge, adj, model_cfg)  # [E,N,A]
        eps = policy.epsilon_at(env_step, total_env_steps, train_cfg)
        act_keys = jax.random.split(k, n_envs)
        actions, _ = jax.vmap(policy.epsilon_greedy,
                              in_axes=(0, 0, None))(act_keys, q, eps)
        env_states, v2v_rate, v2i_rate, _ = jax.vmap(
            lambda s, c, a: vehicular.apply_precomputed_transition(
                s, c, a[:, None], env_cfg)
        )(env_states, chan_t, actions)
        rewards = jax.vmap(
            lambda v, i: _weighted_reward(v, i, train_cfg))(v2v_rate, v2i_rate)
        next_node, next_edge = jax.vmap(
            lambda s: features.node_edge_features(s, env_cfg))(env_states)
        traj = (node, edge, adj, actions, rewards, next_node, next_edge)
        return (env_states, env_step + 1), traj

    keys = jax.random.split(k_scan, train_cfg.transitions_per_step)
    (env_states, env_step), traj = jax.lax.scan(
        body, (env_states, agent.env_step), (keys, chan))
    # flatten [T, E, ...] -> [T*E, ...] and land as one scatter per buffer
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), traj)
    rep = replay_lib.add_batch(agent.replay, *flat)
    rewards = traj[4]
    return agent.replace(replay=rep, env_step=env_step), env_states, rewards


# ---------------------------------------------------------------------------
# Replay / learning step
# ---------------------------------------------------------------------------

def bellman_targets(q_online_s, q_target_sp, actions, rewards,
                    gamma: float) -> jax.Array:
    """y = q_online(s) with y[n, a_n] = r + gamma * max_a q_target(s')[n, a]
    (reference BS_brain.py:670-692; the reward is global across heads).

    Shapes: q_* [B, N, A], actions [B, N], rewards [B]. Returns [B, N, A].
    """
    boot = rewards[:, None] + gamma * jnp.max(q_target_sp, axis=-1)  # [B, N]
    onehot = jax.nn.one_hot(actions, q_online_s.shape[-1],
                            dtype=q_online_s.dtype)
    return q_online_s * (1.0 - onehot) + boot[..., None] * onehot


def compute_replay_grads(agent: AgentState, key: jax.Array,
                         model_cfg: ModelConfig, train_cfg: TrainConfig,
                         batch_size: int, axis_name: str | None = None
                         ) -> Tuple[Any, Dict[str, jax.Array]]:
    """Sample a batch from (the local shard of) replay and compute loss
    gradients + metrics (reference semantics: BS_brain.py:555-748).

    When `axis_name` is given (inside shard_map), the loss is `pmean`ed over
    that mesh axis *inside* the differentiated function, so the returned
    gradients are exactly the gradients of the global mean loss — shard_map's
    varying-axis autodiff then keeps them replicated without any manual
    gradient allreduce."""
    idx = replay_lib.sample_indices(agent.replay, key, batch_size, train_cfg)
    batch = replay_lib.gather(agent.replay, idx)
    return grads_from_batch(agent.params, agent.target_params, batch,
                            model_cfg, train_cfg, axis_name)


def grads_from_batch(params: Any, target_params: Any, batch,
                     model_cfg: ModelConfig, train_cfg: TrainConfig,
                     axis_name: str | None = None
                     ) -> Tuple[Any, Dict[str, jax.Array]]:
    """Loss gradients + metrics for one (S, A, R, S') batch (reference
    BS_brain.py:664-748). Split out of `compute_replay_grads` so the
    golden-parity test (tests/test_parity_golden.py) can drive an exact
    batch through the same code path the trainer uses."""
    node, edge, adj, action, reward, next_node, next_edge = batch

    # S' reuses S's adjacency (reference BS_brain.py:583).
    q_sp = gnn_dqn.apply(target_params, next_node, next_edge, adj,
                         model_cfg)

    def loss_fn(p):
        q = gnn_dqn.apply(p, node, edge, adj, model_cfg)
        # Bellman targets from THIS forward's (stop-gradded) q — identical
        # math to a separate q_s forward (the reference's predict at
        # BS_brain.py:664 and its fit use the same pre-update weights), so
        # the extra batch-512 online forward disappears. Non-chosen entries
        # contribute huber(stop_grad(q), q): zero value AND zero gradient
        # (huber'(0) = 0), exactly as with an externally-built y.
        y = jax.lax.stop_gradient(
            bellman_targets(q, q_sp, action, reward, train_cfg.gamma))
        per_head = jnp.mean(losses.huber(y, q), axis=(0, 2))  # [N]
        if axis_name is not None:
            per_head = jax.lax.pmean(per_head, axis_name)
        return jnp.sum(per_head), (per_head, q, y)

    (loss, (per_head_loss, q_s, y)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)

    n_actions = q_s.shape[-1]
    metrics = {
        "loss": loss,
        "loss_per_head": per_head_loss,                          # [N]
        "q_mean": jnp.mean(jnp.sum(y, axis=-1) / n_actions, axis=0),   # [N]
        "q_max_mean": jnp.mean(jnp.max(y, axis=-1), axis=0),     # [N]
        "orig_q_mean": jnp.mean(jnp.sum(q_s, axis=-1) / n_actions, axis=0),
        "orig_q_max_mean": jnp.mean(jnp.max(q_s, axis=-1), axis=0),
    }
    return grads, metrics


def apply_grads(agent: AgentState, grads: Any,
                train_cfg: TrainConfig) -> AgentState:
    """One Adam step (Adam(1e-3, beta1=0.5), reference BS_brain.py:212-214)."""
    updates, opt_state = make_optimizer(train_cfg).update(
        grads, agent.opt_state, agent.params)
    params = optax.apply_updates(agent.params, updates)
    return agent.replace(params=params, opt_state=opt_state)


def rollout_batched_parallel(agent: AgentState,
                             env_states: vehicular.EnvState,
                             key: jax.Array, env_cfg: EnvConfig,
                             model_cfg: ModelConfig, train_cfg: TrainConfig,
                             total_env_steps: int
                             ) -> Tuple[AgentState, vehicular.EnvState,
                                        jax.Array]:
    """Scan-free batched rollout: `rollout_parallel`'s transform applied to
    the [E]-env bank (config 3) — all T x E featurizations in one vmapped
    pass, all T x E policy forwards as ONE batched forward. Same validity
    condition (all links active) and same trajectory as `rollout_batched`
    given the same key (equality pinned in tests)."""
    t_steps = train_cfg.transitions_per_step
    k_traj, k_scan = jax.random.split(key)
    n_envs = jax.tree.leaves(env_states)[0].shape[0]
    chan = jax.vmap(lambda s, k: vehicular.precompute_channel_trajectory(
        s, k, env_cfg, t_steps))(
            env_states, jax.random.split(k_traj, n_envs))
    stacked = jax.vmap(
        lambda s, c: _stacked_rollout_states(s, c, env_cfg))(
            env_states, chan)                       # [E, T+1, ...]

    node_all, edge_all = jax.vmap(jax.vmap(
        lambda s: features.node_edge_features(s, env_cfg)))(stacked)
    adj = jax.vmap(lambda s: features.adjacency(s, env_cfg))(env_states)
    # [E, T, ...] -> [T, E, ...] to mirror the scan's per-step layout
    node = jnp.swapaxes(node_all[:, :t_steps], 0, 1)
    edge = jnp.swapaxes(edge_all[:, :t_steps], 0, 1)
    next_node = jnp.swapaxes(node_all[:, 1:], 0, 1)
    next_edge = jnp.swapaxes(edge_all[:, 1:], 0, 1)
    adj_b = jnp.broadcast_to(adj[None], (t_steps,) + adj.shape)

    n_nodes = node.shape[2]
    q = gnn_dqn.apply(agent.params,
                      node.reshape(t_steps * n_envs, n_nodes, -1),
                      edge.reshape(t_steps * n_envs, n_nodes, -1),
                      adj_b.reshape(t_steps * n_envs, n_nodes, n_nodes),
                      model_cfg).reshape(t_steps, n_envs, n_nodes, -1)
    eps = jax.vmap(lambda t: policy.epsilon_at(
        agent.env_step + t, total_env_steps, train_cfg))(
            jnp.arange(t_steps))
    act_keys = jax.vmap(lambda k: jax.random.split(k, n_envs))(
        jax.random.split(k_scan, t_steps))          # [T, E, 2]
    actions, _ = jax.vmap(jax.vmap(policy.epsilon_greedy,
                                   in_axes=(0, 0, None)))(
        act_keys, q, eps)                           # [T, E, N]

    acting = jax.tree.map(
        lambda x: jnp.swapaxes(x[:, :t_steps], 0, 1), stacked)
    v2v_rate, v2i_rate, _ = jax.vmap(jax.vmap(
        lambda s, a: vehicular.compute_reward_with_channel_selection(
            s, a[:, None], env_cfg)))(acting, actions)
    rewards = jax.vmap(jax.vmap(
        lambda v, i: _weighted_reward(v, i, train_cfg)))(v2v_rate, v2i_rate)

    traj = (node, edge, adj_b, actions, rewards, next_node, next_edge)
    flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), traj)
    rep = replay_lib.add_batch(agent.replay, *flat)
    final_states = jax.tree.map(lambda x: x[:, -1], stacked)
    return (agent.replace(replay=rep,
                          env_step=agent.env_step + t_steps),
            final_states, rewards)


def replay_update(agent: AgentState, key: jax.Array, model_cfg: ModelConfig,
                  train_cfg: TrainConfig
                  ) -> Tuple[AgentState, Dict[str, jax.Array]]:
    """One learning step from replay (reference `Agent.replay`,
    BS_brain.py:555-748). Returns (agent', metrics) with the reference's
    metric semantics: per-head loss, target-Q mean/max, online-Q mean/max."""
    grads, metrics = compute_replay_grads(agent, key, model_cfg, train_cfg,
                                          train_cfg.batch_size)
    return apply_grads(agent, grads, train_cfg), metrics


def maybe_sync_target(agent: AgentState, train_cfg: TrainConfig) -> AgentState:
    """Hard sync when env_step hits the update frequency (reference
    BS_brain.py:846-847 checks after each train step).

    `lax.cond` instead of per-leaf `where`: the where form rewrites every
    target buffer every step (measured ~0.25 ms/step, a quarter of the
    whole train step); the cond's no-sync branch passes the existing
    buffers through."""
    sync = (agent.env_step % train_cfg.target_update_every_env_steps) == 0
    target = jax.lax.cond(sync, lambda: agent.params,
                          lambda: agent.target_params)
    return agent.replace(target_params=target)


def train_step(agent: AgentState, env_state: vehicular.EnvState,
               key: jax.Array, env_cfg: EnvConfig, model_cfg: ModelConfig,
               train_cfg: TrainConfig, total_env_steps: int
               ) -> Tuple[AgentState, vehicular.EnvState, jax.Array,
                          Dict[str, jax.Array]]:
    """One full training step: 50-transition rollout burst + one replay
    update + conditional target sync (reference BS_brain.py:818-847)."""
    k_roll, k_replay = jax.random.split(key)
    roll = rollout_parallel if train_cfg.parallel_rollout else rollout
    agent, env_state, rewards = roll(
        agent, env_state, k_roll, env_cfg, model_cfg, train_cfg,
        total_env_steps)
    agent, metrics = replay_update(agent, k_replay, model_cfg, train_cfg)
    agent = maybe_sync_target(agent, train_cfg)
    return agent, env_state, rewards, metrics


def train_episode(agent: AgentState, key: jax.Array, env_cfg: EnvConfig,
                  model_cfg: ModelConfig, train_cfg: TrainConfig,
                  num_train_steps: int, total_env_steps: int,
                  num_envs: int = 1
                  ) -> Tuple[AgentState, jax.Array, Dict[str, jax.Array]]:
    """One whole training episode as a single device program: fresh env(s)
    (reference BS_brain.py:810) + `num_train_steps` scanned train steps.

    Host code dispatches once per episode and pulls one small stacked
    metrics pytree — per-step host round trips (the reference's pattern)
    dominate wall-time otherwise.

    num_envs > 1 (config 3) resets and rolls a vmapped bank of environments
    feeding the shared replay ring; the learner is unchanged.

    Returns (agent', rewards [S, T*num_envs], metrics with leading [S]).
    """
    k_env, k_scan = jax.random.split(key)

    if num_envs == 1:
        env_state = vehicular.new_random_game(k_env, env_cfg)

        def body(carry, k):
            agent, env_state = carry
            agent, env_state, rewards, metrics = train_step(
                agent, env_state, k, env_cfg, model_cfg, train_cfg,
                total_env_steps)
            return (agent, env_state), (rewards, metrics)
    else:
        env_state = jax.vmap(lambda k: vehicular.new_random_game(k, env_cfg))(
            jax.random.split(k_env, num_envs))

        roll_b = (rollout_batched_parallel if train_cfg.parallel_rollout
                  else rollout_batched)

        def body(carry, k):
            agent, env_states = carry
            k_roll, k_replay = jax.random.split(k)
            agent, env_states, rewards = roll_b(
                agent, env_states, k_roll, env_cfg, model_cfg, train_cfg,
                total_env_steps)
            agent, metrics = replay_update(agent, k_replay, model_cfg,
                                           train_cfg)
            agent = maybe_sync_target(agent, train_cfg)
            return (agent, env_states), (rewards.reshape(-1), metrics)

    keys = jax.random.split(k_scan, num_train_steps)
    (agent, _), (rewards, metrics) = jax.lax.scan(
        body, (agent, env_state), keys)
    return agent, rewards, metrics


# metric packing order for train_episodes (host unpacks by this order)
PACKED_METRICS = ("loss_per_head", "q_mean", "q_max_mean", "orig_q_mean",
                  "orig_q_max_mean")


def train_episodes(agent: AgentState, key: jax.Array, env_cfg: EnvConfig,
                   model_cfg: ModelConfig, train_cfg: TrainConfig,
                   num_episodes: int, num_train_steps: int,
                   total_env_steps: int,
                   num_envs: int = 1) -> Tuple[AgentState, jax.Array]:
    """A chunk of `num_episodes` full episodes as ONE device program.

    Device<->host latency dominates a per-episode driver (each transfer is a
    full round trip), so metrics are packed into a single array
    [C, S, 5N + 1]: the five per-head metric families (PACKED_METRICS
    order) followed by the per-train-step reward total.
    `unpack_episode_metrics` restores the dict on host.
    """

    def body(agent, k):
        agent, rewards, metrics = train_episode(
            agent, k, env_cfg, model_cfg, train_cfg, num_train_steps,
            total_env_steps, num_envs)
        # Rewards are reduced ON DEVICE to the per-train-step total: the
        # host only ever sums them (per-episode returns), and the tunnel
        # moves ~3-4 MB/s — per-transition detail was 50 of the 70 packed
        # floats per step (round-4 transfer measurement).
        packed = jnp.concatenate(
            [metrics[name] for name in PACKED_METRICS]
            + [rewards.sum(axis=-1, keepdims=True)], axis=-1)
        return agent, packed

    keys = jax.random.split(key, num_episodes)
    agent, packed = jax.lax.scan(body, agent, keys)
    return agent, packed


def train_episodes_snapshots(agent: AgentState, key: jax.Array,
                             env_cfg: EnvConfig, model_cfg: ModelConfig,
                             train_cfg: TrainConfig, num_episodes: int,
                             num_train_steps: int, total_env_steps: int,
                             snapshot_every: int, num_envs: int = 1
                             ) -> Tuple[AgentState, jax.Array, Tuple]:
    """Chunked training with in-chunk checkpoint snapshots.

    `train_episodes` bounds the dispatch chunk by the checkpoint cadence
    (the reference saves both networks every `Save_Model_Interval=5`
    episodes, BS_brain.py:791,853-869), which leaves the trainer dominated
    by per-dispatch tunnel latency. This variant runs `num_episodes`
    episodes as ONE device program while still emitting a
    (params, target_params, opt_state, env_step) snapshot after every
    `snapshot_every`-th episode, so the host can write checkpoints at the
    reference cadence from a single round trip. Snapshots are stacked
    (leading dim G = num_episodes // snapshot_every); the model is tiny,
    so the extra output is a few hundred KB per group. Snapshots carry the
    optimizer state so a crash between chunk-final saves still resumes
    exactly (params + target + Adam moments + env_step).

    num_episodes must be a multiple of snapshot_every.
    Returns (agent', packed [C, S, D], snaps).
    """
    assert num_episodes % snapshot_every == 0, (num_episodes, snapshot_every)
    num_groups = num_episodes // snapshot_every

    def group(agent, k):
        agent, packed = train_episodes(
            agent, k, env_cfg, model_cfg, train_cfg, snapshot_every,
            num_train_steps, total_env_steps, num_envs)
        snap = (agent.params, agent.target_params, agent.opt_state,
                agent.env_step)
        return agent, (packed, snap)

    keys = jax.random.split(key, num_groups)
    agent, (packed, snaps) = jax.lax.scan(group, agent, keys)
    packed = packed.reshape((num_episodes,) + packed.shape[2:])
    return agent, packed, snaps


def unpack_episode_metrics(packed, n_nodes: int):
    """Host-side inverse of the train_episodes packing.

    packed: [C, S, 5N + 1] numpy array ->
    (metrics dict of [C, S, N] arrays, per-step reward totals [C, S, 1])."""
    out = {}
    for i, name in enumerate(PACKED_METRICS):
        out[name] = packed[..., i * n_nodes:(i + 1) * n_nodes]
    rewards = packed[..., len(PACKED_METRICS) * n_nodes:]
    return out, rewards
