"""Integration tests: harness Agent (train / checkpoint / test / evaluate)."""

import dataclasses

import numpy as np
import pytest

from gnnra_tpu.config import (EnvConfig, EvalConfig, ModelConfig, RunConfig,
                              TrainConfig)
from gnnra_tpu.harness.agent import Agent, enumerate_joint_actions
from gnnra_tpu.harness import run_main, train_main


def tiny_cfg(tmp_seedless=True):
    return RunConfig(
        env=EnvConfig(),
        model=ModelConfig(),
        train=TrainConfig(num_episodes=4, num_train_steps=2,
                          transitions_per_step=10, batch_size=16,
                          memory_capacity=512, save_model_interval=2,
                          target_update_every_env_steps=20),
        eval=EvalConfig(num_episodes=3, num_test_steps=5, num_trials=2,
                        evaluation_episode_interval=2),
        name="tiny")


class TestEnumerate:
    def test_joint_actions(self):
        acts = np.asarray(enumerate_joint_actions(4, 4))
        assert acts.shape == (256, 4)
        # base-4 decode ordering (reference BS_brain.py:1067-1078):
        # index n -> [n//64, (n%64)//16, (n%16)//4, n%4]
        np.testing.assert_array_equal(acts[0], [0, 0, 0, 0])
        np.testing.assert_array_equal(acts[255], [3, 3, 3, 3])
        np.testing.assert_array_equal(acts[27], [0, 1, 2, 3])


class TestTrainHarness:
    def test_train_and_checkpoint(self, tmp_path):
        agent = Agent(tiny_cfg(), results_base=str(tmp_path))
        results = agent.train()
        assert results["train_loss"].shape == (4, 4, 2)
        assert results["reward_per_episode"].shape == (4,)
        assert np.isfinite(results["reward_per_episode"]).all()
        # checkpoints at episodes 2 and 4
        import os
        from gnnra_tpu.utils import checkpoint as ckpt
        for ep in (2, 4):
            assert os.path.exists(ckpt.checkpoint_path(agent.results_dir, ep))

    def test_checkpoint_roundtrip(self, tmp_path):
        agent = Agent(tiny_cfg(), results_base=str(tmp_path))
        agent.train(num_episodes=2, num_train_steps=1)
        w_before = np.asarray(agent.state.params["gnn"][0]["w1"])
        agent.save_checkpoint(99)
        # mutate then restore
        import jax
        agent.state = agent.state.replace(
            params=jax.tree.map(lambda x: x * 0, agent.state.params))
        agent.load_checkpoint(99)
        np.testing.assert_array_equal(
            np.asarray(agent.state.params["gnn"][0]["w1"]), w_before)

    def test_build_agent_overrides(self, tmp_path):
        agent = train_main.build_agent("parity", episodes=7, batch_size=32,
                                       gamma=0.3, v2i_weight=0.5, seed=5,
                                       results_base=str(tmp_path))
        assert agent.train_cfg.num_episodes == 7
        assert agent.train_cfg.batch_size == 32
        assert agent.train_cfg.gamma == 0.3
        assert agent.train_cfg.v2i_weight == 0.5


class TestTestRun:
    @pytest.fixture(scope="class")
    def trained_agent(self, tmp_path_factory):
        agent = Agent(tiny_cfg(), results_base=str(
            tmp_path_factory.mktemp("results")))
        agent.train()
        return agent

    def test_test_run_shapes(self, trained_agent):
        results = trained_agent.test_run(num_episodes=3, num_test_steps=5,
                                         opt_flag=False)
        assert results["reward"].shape == (3, 5)
        assert results["v2v_rate"].shape == (3, 5, 4)
        assert results["v2i_rate"].shape == (3, 5, 4)
        assert results["interference"].shape == (3, 5, 4)
        assert results["expect_return"].shape == (3,)
        assert np.isfinite(results["reward"]).all()

    def test_opt_baseline_dominates(self, trained_agent):
        results = trained_agent.test_run(num_episodes=2, num_test_steps=4,
                                         opt_flag=True)
        # brute-force optimum >= both RL and RA rewards at every step
        assert np.all(results["opt_reward"] >= results["reward"] - 1e-4)
        assert np.all(results["opt_reward"] >= results["ra_reward"] - 1e-4)
        assert results["opt_action_index"].shape == (2, 4)
        assert np.all(results["opt_action_index"] < 256)

    def test_report_summary(self, trained_agent):
        results = trained_agent.test_run(num_episodes=2, num_test_steps=4,
                                         opt_flag=True)
        summary = run_main.report(results)
        assert summary["episodes"] == 2
        assert 0.0 <= summary["rl_optimality_ratio"] <= 1.001
        assert set(summary["v2i_success_ratio_rl"]) == set(range(18, 31))


class TestEvaluate:
    def test_evaluate_over_checkpoints(self, tmp_path):
        agent = Agent(tiny_cfg(), results_base=str(tmp_path))
        agent.train()          # saves checkpoints at episodes 2, 4
        results = agent.evaluate_training_diff_trials(
            num_episodes=4, num_test_steps=5, opt_flag=True,
            fixed_epsilon=0.0, num_trials=2)
        ret = results["evaluation_return_per_episode"]
        assert ret.shape == (2, 2)      # 2 trials x (4 episodes / interval 2)
        assert np.isfinite(ret).all()
        assert results["ra_expect_return"].shape == (2, 2)
        # ground-truth optimal captured at the first checkpoint
        assert np.all(results["opt_expect_return"] > 0)

    def test_trial_seeds_reproducible(self, tmp_path):
        agent = Agent(tiny_cfg(), results_base=str(tmp_path))
        agent.train()
        r1 = agent.evaluate_training_diff_trials(
            num_episodes=4, num_test_steps=5, num_trials=1)
        r2 = agent.evaluate_training_diff_trials(
            num_episodes=4, num_test_steps=5, num_trials=1)
        np.testing.assert_allclose(r1["evaluation_return_per_episode"],
                                   r2["evaluation_return_per_episode"])


class TestLearningSanity:
    def test_rl_beats_random_after_training(self, tmp_path):
        """The reference's de-facto acceptance criterion: trained greedy
        policy beats Random-Action on average (SURVEY.md §4)."""
        cfg = dataclasses.replace(
            tiny_cfg(),
            train=TrainConfig(num_episodes=12, num_train_steps=4,
                              transitions_per_step=20, batch_size=64,
                              memory_capacity=2048, save_model_interval=100,
                              target_update_every_env_steps=100, gamma=0.25,
                              v2i_weight=0.1))
        agent = Agent(cfg, results_base=str(tmp_path))
        agent.train()
        results = agent.test_run(num_episodes=8, num_test_steps=10,
                                 opt_flag=False)
        rl = results["expect_return"].mean()
        ra = results["ra_expect_return"].mean()
        assert rl > ra, f"trained RL ({rl:.2f}) should beat RA ({ra:.2f})"
