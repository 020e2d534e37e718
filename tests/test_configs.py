"""Smoke tests: the named preset configs (scaled 20-node / batched-env)
train end-to-end."""

import dataclasses

import jax
import numpy as np

from gnnra_tpu import config as config_lib
from gnnra_tpu.agent import dqn
from gnnra_tpu.env import vehicular


class TestPresets:
    def test_all_presets_construct(self):
        for name, fn in config_lib.PRESETS.items():
            cfg = fn()
            assert cfg.name == name
            assert cfg.model.n_nodes == cfg.env.n_veh

    def test_parity_derived_sizes(self):
        m = config_lib.parity_config().model
        # reference BS.__init__ derived sizes (BS_brain.py:101-104)
        assert m.node_dim == 9
        assert m.edge_dim == 4
        assert m.d2d_input_dim == 13
        assert m.n_actions == 4


class TestScaledConfig:
    def test_scaled_20_node_train_step(self):
        cfg = config_lib.scaled_config()
        tc = dataclasses.replace(cfg.train, memory_capacity=256,
                                 batch_size=16, transitions_per_step=3)
        agent = dqn.init_agent(jax.random.PRNGKey(0), cfg.model, tc)
        env_state = vehicular.new_random_game(jax.random.PRNGKey(1), cfg.env)
        assert env_state.positions.shape == (20, 2)
        step = jax.jit(dqn.train_step, static_argnums=(3, 4, 5, 6))
        agent, env_state, rewards, metrics = step(
            agent, env_state, jax.random.PRNGKey(2), cfg.env, cfg.model, tc,
            1000)
        assert rewards.shape == (3,)
        assert np.isfinite(float(metrics["loss"]))
        assert metrics["loss_per_head"].shape == (20,)
        # 4-round GNN in bfloat16 still produces finite f32 Q-values
        assert np.all(np.isfinite(np.asarray(rewards)))


class TestBatchedConfig:
    def test_batched_env_rollout(self):
        cfg = config_lib.batched_config(num_envs=8)
        tc = dataclasses.replace(cfg.train, memory_capacity=1024,
                                 batch_size=32, transitions_per_step=4)
        agent = dqn.init_agent(jax.random.PRNGKey(0), cfg.model, tc)
        keys = jax.random.split(jax.random.PRNGKey(1), 8)
        env_states = jax.vmap(
            lambda k: vehicular.new_random_game(k, cfg.env))(keys)
        agent, env_states, rewards = dqn.rollout_batched(
            agent, env_states, jax.random.PRNGKey(2), cfg.env, cfg.model, tc,
            1000)
        assert rewards.shape == (4, 8)
        assert int(agent.replay.size) == 32
        agent, metrics = dqn.replay_update(agent, jax.random.PRNGKey(3),
                                           cfg.model, tc)
        assert np.isfinite(float(metrics["loss"]))


class TestBatchedHarness:
    def test_harness_trains_with_num_envs(self, tmp_path):
        from gnnra_tpu.config import (EnvConfig, EvalConfig, ModelConfig,
                                      RunConfig, TrainConfig)
        from gnnra_tpu.harness import Agent
        cfg = RunConfig(
            env=EnvConfig(), model=ModelConfig(),
            train=TrainConfig(num_episodes=2, num_train_steps=2,
                              transitions_per_step=5, batch_size=16,
                              memory_capacity=512, save_model_interval=2,
                              num_envs=4),
            eval=EvalConfig(num_episodes=2, num_test_steps=4))
        agent = Agent(cfg, results_base=str(tmp_path))
        results = agent.train()
        # rewards come back as per-train-step totals (reduced on device —
        # the tunnel's ~3-4 MB/s makes per-transition transfer dominant)
        assert results["reward_total_per_train_step"].shape == (2, 2, 1)
        assert np.isfinite(results["reward_per_episode"]).all()
        # replay accumulated T*num_envs transitions per train step
        assert int(agent.state.replay.size) == 2 * 2 * 5 * 4


class TestSyntheticGraphConfig:
    def test_build_graph_topologies(self):
        import dataclasses
        from gnnra_tpu.config import SyntheticGraphConfig
        cfg = dataclasses.replace(SyntheticGraphConfig(), num_nodes=2000,
                                  num_edges=16000)
        g_geo = cfg.build_graph()
        assert g_geo.num_nodes == 2000
        assert 0.3 < g_geo.num_edges / 16000 < 3.0   # lands near target
        g_rand = dataclasses.replace(cfg, topology="random").build_graph()
        assert g_rand.num_edges == 16000
