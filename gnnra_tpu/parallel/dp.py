"""Data-parallel training over a device mesh (shard_map + explicit psum).

New capability over the reference (which is strictly single-device,
RL_Train_main.py:13-19). Design:

  * params / target params / optimizer state: replicated on every device.
  * environments: E_local envs per device, stepped with `rollout_batched`
    (vmap over envs inside a lax.scan over transitions).
  * replay ring: sharded — each device owns its own ring fed by its own
    envs; learning samples a local batch_size/n_dev sub-batch.
  * gradients: the per-device loss is `pmean`ed over the 'data' mesh axis
    *inside* the differentiated function, so autodiff produces the gradients
    of the global mean loss directly (XLA allreduce over ICI) and an
    identical Adam step everywhere keeps params in sync.

The whole train step is one `shard_map`-ped jitted program; host code only
supplies keys.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gnnra_tpu.agent import dqn, replay as replay_lib
from gnnra_tpu.config import EnvConfig, ModelConfig, TrainConfig
from gnnra_tpu.env import vehicular


class DPTrainState(struct.PyTreeNode):
    """Distributed train state. `agent` leaves are replicated except the
    replay ring, which carries a leading [n_dev] device axis; env_states
    carry [n_dev, envs_per_device]."""

    params: dict
    target_params: dict
    opt_state: tuple
    env_step: jax.Array
    replay: replay_lib.ReplayState     # leaves [D, ...]
    env_states: vehicular.EnvState     # leaves [D, E, ...]


def init_dp_state(key: jax.Array, mesh: Mesh, env_cfg: EnvConfig,
                  model_cfg: ModelConfig, train_cfg: TrainConfig,
                  envs_per_device: int = 1) -> DPTrainState:
    n_dev = mesh.devices.size
    agent = dqn.init_agent(key, model_cfg, train_cfg)
    local_capacity = max(train_cfg.memory_capacity // n_dev, 1)
    replay_local = replay_lib.init(model_cfg, local_capacity)
    replay = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_dev,) + x.shape), replay_local)
    keys = jax.random.split(jax.random.fold_in(key, 7),
                            n_dev * envs_per_device)
    env_states = jax.vmap(lambda k: vehicular.new_random_game(k, env_cfg))(
        keys)
    env_states = jax.tree.map(
        lambda x: x.reshape((n_dev, envs_per_device) + x.shape[1:]),
        env_states)
    return DPTrainState(params=agent.params,
                        target_params=agent.target_params,
                        opt_state=agent.opt_state, env_step=agent.env_step,
                        replay=replay, env_states=env_states)


def make_dp_train_step(mesh: Mesh, env_cfg: EnvConfig, model_cfg: ModelConfig,
                       train_cfg: TrainConfig, total_env_steps: int,
                       axis: str = "data"):
    """Build the jitted data-parallel train step:
    (state, key) -> (state', rewards [D, T, E], metrics)."""
    n_dev = mesh.devices.size
    local_batch = max(train_cfg.batch_size // n_dev, 1)

    def per_device(params, target_params, opt_state, env_step, replay,
                   env_states, key):
        # local views: replay [1, ...] -> [...], env_states [1, E, ...]
        replay = jax.tree.map(lambda x: x[0], replay)
        env_states = jax.tree.map(lambda x: x[0], env_states)
        my_key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        k_roll, k_replay = jax.random.split(my_key)

        agent = dqn.AgentState(params=params, target_params=target_params,
                               opt_state=opt_state, replay=replay,
                               env_step=env_step)
        agent, env_states, rewards = dqn.rollout_batched(
            agent, env_states, k_roll, env_cfg, model_cfg, train_cfg,
            total_env_steps)
        grads, metrics = dqn.compute_replay_grads(
            agent, k_replay, model_cfg, train_cfg, local_batch,
            axis_name=axis)
        metrics = jax.lax.pmean(metrics, axis)
        agent = dqn.apply_grads(agent, grads, train_cfg)
        agent = dqn.maybe_sync_target(agent, train_cfg)

        replay = jax.tree.map(lambda x: x[None], agent.replay)
        env_states = jax.tree.map(lambda x: x[None], env_states)
        return (agent.params, agent.target_params, agent.opt_state,
                agent.env_step, replay, env_states, rewards[None], metrics)

    rep = P()
    sharded = P(axis)
    mapped = shard_map(
        per_device, mesh=mesh,
        in_specs=(rep, rep, rep, rep, sharded, sharded, rep),
        out_specs=(rep, rep, rep, rep, sharded, sharded, sharded, rep))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: DPTrainState, key: jax.Array
             ) -> Tuple[DPTrainState, jax.Array, Dict[str, jax.Array]]:
        (params, target, opt_state, env_step, replay, env_states, rewards,
         metrics) = mapped(state.params, state.target_params, state.opt_state,
                           state.env_step, state.replay, state.env_states,
                           key)
        new_state = DPTrainState(params=params, target_params=target,
                                 opt_state=opt_state, env_step=env_step,
                                 replay=replay, env_states=env_states)
        return new_state, rewards, metrics

    return step
