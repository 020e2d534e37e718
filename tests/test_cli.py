"""End-to-end CLI tests for the three entry points (tiny configs, CPU)."""

import dataclasses
import os

import numpy as np

import gnnra_tpu.config as config_lib
from gnnra_tpu.harness import evaluate_main, run_main, train_main


def tiny_preset():
    cfg = config_lib.parity_config()
    return dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, num_episodes=4,
                                  num_train_steps=2, transitions_per_step=5,
                                  batch_size=8, memory_capacity=256,
                                  save_model_interval=2),
        eval=dataclasses.replace(cfg.eval, num_episodes=2, num_test_steps=3,
                                 num_trials=2, evaluation_episode_interval=2))


class TestCLIs:
    def test_train_test_evaluate_roundtrip(self, tmp_path, monkeypatch):
        # patch the preset registry so the CLIs get a tiny config
        monkeypatch.setitem(config_lib.PRESETS, "parity", tiny_preset)
        base = str(tmp_path)

        results = train_main.main(
            ["--preset", "parity", "--results-base", base, "--no-plots"])
        assert results["train_loss"].shape[1] == 4  # episodes
        out_dirs = os.listdir(base)
        assert len(out_dirs) == 1
        run_dir = os.path.join(base, out_dirs[0])
        assert os.path.exists(os.path.join(run_dir, "train-results.npz"))
        assert any(f.startswith("checkpoint-episode-")
                   for f in os.listdir(run_dir))

        test_results, summary = run_main.main(
            ["--preset", "parity", "--checkpoint", "4", "--episodes", "2",
             "--test-steps", "3", "--opt", "--results-base", base,
             "--no-plots"])
        assert summary["episodes"] == 2
        assert "rl_optimality_ratio" in summary
        assert os.path.exists(os.path.join(run_dir, "test-results.npz"))

        eval_results = evaluate_main.main(
            ["--preset", "parity", "--episodes", "4", "--test-steps", "3",
             "--trials", "2", "--results-base", base, "--no-plots"])
        assert eval_results["evaluation_return_per_episode"].shape == (2, 2)
        assert os.path.exists(os.path.join(run_dir,
                                           "evaluation-results.npz"))
        assert np.isfinite(
            eval_results["evaluation_return_per_episode"]).all()
