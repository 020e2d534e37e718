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


class TestCrashResume:
    """Crash-injection recovery (SURVEY.md §5 failure detection/recovery).

    The Agent object holds ALL trainer state (params, target, optimizer
    moments, env-step counter, host RNG position), so constructing a fresh
    Agent over the same results dir is exactly what a crashed-and-restarted
    worker process does (scripts/resilient_train.py:38-39)."""

    def _cfg(self, chunk):
        return dataclasses.replace(
            tiny_cfg(), train=TrainConfig(
                num_episodes=4, num_train_steps=2, transitions_per_step=10,
                batch_size=16, memory_capacity=512, save_model_interval=2,
                target_update_every_env_steps=20, episode_chunk=chunk))

    def test_resume_reproduces_uninterrupted_run(self, tmp_path):
        """Kill after episode 2 of 4; the resumed run must produce exactly
        the same final state and metrics as the uninterrupted run."""
        cfg = self._cfg(chunk=2)   # chunk-final checkpoints at 2 and 4

        full = Agent(cfg, results_base=str(tmp_path / "full"))
        full_results = full.train(schedule_episodes=4)

        crashed = Agent(cfg, results_base=str(tmp_path / "crashed"))
        crashed.train(num_episodes=2, schedule_episodes=4,
                      save_resume_state=True)
        del crashed  # simulated crash: worker process dies after episode 2

        resumed = Agent(cfg, results_base=str(tmp_path / "crashed"))
        start = resumed.resume_latest()
        assert start == 2
        assert int(resumed.state.env_step) == 2 * 2 * 10  # ep*steps*trans
        resumed_results = resumed.train(num_episodes=2, schedule_episodes=4,
                                        start_episode=2)

        import jax
        for a, b in zip(jax.tree.leaves(full.state.params),
                        jax.tree.leaves(resumed.state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(full.state.opt_state),
                        jax.tree.leaves(resumed.state.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(full.state.env_step) == int(resumed.state.env_step)
        np.testing.assert_array_equal(
            full_results["train_loss"][:, 2:, :],
            resumed_results["train_loss"])
        np.testing.assert_array_equal(
            full_results["reward_per_episode"][2:],
            resumed_results["reward_per_episode"])

    def test_resume_from_inchunk_snapshot_restores_opt_state(self, tmp_path):
        """Crash after an in-chunk snapshot checkpoint landed but before the
        chunk-final save: resume must restore the snapshot's optimizer
        moments, not silently reset Adam (round-1 advisor finding)."""
        import os

        import jax

        from gnnra_tpu.utils import checkpoint as ckpt

        cfg = self._cfg(chunk=4)   # one 4-episode chunk, snapshot at 2
        agent = Agent(cfg, results_base=str(tmp_path))
        agent.train()
        # simulate dying before the chunk-final save landed
        os.remove(ckpt.checkpoint_path(agent.results_dir, 4))

        resumed = Agent(cfg, results_base=str(tmp_path))
        fresh_opt = jax.tree.map(np.asarray,
                                 jax.tree.leaves(resumed.state.opt_state))
        assert resumed.resume_latest() == 2
        assert int(resumed.state.env_step) == 2 * 2 * 10
        restored = jax.tree.map(np.asarray,
                                jax.tree.leaves(resumed.state.opt_state))
        # Adam moments must be the trained ones, not the fresh zeros
        changed = any(not np.array_equal(a, b)
                      for a, b in zip(fresh_opt, restored))
        assert changed, "optimizer state silently reset on resume"


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
