"""Tests: checkpoint utils, debugging helpers, native library, plotting."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gnnra_tpu.config import EnvConfig, ModelConfig
from gnnra_tpu.env import vehicular
from gnnra_tpu.models import gnn_dqn
from gnnra_tpu.utils import checkpoint as ckpt
from gnnra_tpu.utils import debugging, plotting


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        cfg = ModelConfig()
        p1 = gnn_dqn.init_params(jax.random.PRNGKey(0), cfg)
        p2 = gnn_dqn.init_params(jax.random.PRNGKey(1), cfg)
        path = str(tmp_path / "ckpt.npz")
        ckpt.save(path, p1, p2, episode=7)
        r1, r2, _, scalars = ckpt.load(path, p1, p2)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(r1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(r2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(scalars["episode"]) == 7

    def test_result_dir_encodes_hyperparams(self):
        from gnnra_tpu.config import TrainConfig
        d = ckpt.result_dir("/base", TrainConfig(batch_size=512, gamma=0.5,
                                                 v2i_weight=0.1))
        assert "batch-512" in d and "gamma-0.5" in d and "v2iweight-0.1" in d


class TestDebugging:
    def test_validate_env_state_ok(self):
        cfg = EnvConfig()
        state = vehicular.new_random_game(jax.random.PRNGKey(0), cfg)
        debugging.validate_env_state(state, cfg)

    def test_tree_all_finite(self):
        good = {"a": jnp.ones(3), "b": jnp.zeros((2, 2))}
        bad = {"a": jnp.asarray([1.0, jnp.nan])}
        assert debugging.tree_all_finite(good)
        assert not debugging.tree_all_finite(bad)


class TestNative:
    def test_native_matches_numpy_fallback(self):
        from gnnra_tpu import graph as graph_lib
        from gnnra_tpu.native import native_available
        g = graph_lib.random_graph_host(3, 500, 3000)
        b_np = graph_lib.block_by_receiver(g, use_native=False)
        if not native_available():
            return  # toolchain-less environment: fallback is the behavior
        b_nat = graph_lib.block_by_receiver(g, use_native=True)
        for a, b in [(b_nat.senders, b_np.senders),
                     (b_nat.recv_local, b_np.recv_local),
                     (b_nat.weights, b_np.weights)]:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPlotting:
    def test_smooth(self):
        x = np.ones(100)
        assert plotting.smooth(x, 10).shape == (91,)
        np.testing.assert_allclose(plotting.smooth(x, 10), 1.0)

    def test_success_ratios(self):
        v2i = np.full((10, 5, 4), 5.0)      # sum over RB = 20
        ratios = plotting.success_ratios(v2i)
        assert ratios[18] == 1.0 and ratios[19] == 1.0 and ratios[20] == 1.0
        assert ratios[21] == 0.0

    def test_plot_training_writes_files(self, tmp_path):
        results = {
            "train_loss": np.random.rand(4, 60, 2),
            "train_q_mean": np.random.rand(4, 60, 2),
            "orig_train_q_mean": np.random.rand(4, 60, 2),
            "reward_per_episode": np.random.rand(60),
        }
        plotting.plot_training(results, str(tmp_path), window=10)
        assert os.path.exists(tmp_path / "train-loss.png")
        assert os.path.exists(tmp_path / "return-per-episode.png")


class TestProfiling:
    def test_trace_capture_writes_files(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from gnnra_tpu.utils import profiling
        log_dir = str(tmp_path / "trace")
        with profiling.trace(log_dir):
            with profiling.named_scope("profiled-matmul"):
                x = jax.jit(lambda a: a @ a)(jnp.ones((64, 64)))
            jax.block_until_ready(x)
        import os
        found = []
        for root, _, files in os.walk(log_dir):
            found.extend(files)
        assert found, "profiler trace produced no files"

    def test_throughput_counter(self):
        from gnnra_tpu.utils import profiling
        t = profiling.Throughput("steps")
        t.start()
        t.add(100)
        rate = t.rate()
        assert rate > 0
        assert profiling.edges_per_second(1_000_000, 0.5) == 2_000_000


class TestRingPartitionNative:
    def test_native_matches_numpy_fallback(self):
        from gnnra_tpu import graph as graph_lib
        from gnnra_tpu.native import native_available
        from gnnra_tpu.parallel import graph_parallel
        import numpy as np
        g = graph_lib.random_graph_host(3, 500, 4000)
        p_np = graph_parallel.partition_for_ring(g, num_devices=4,
                                                 r_block=64,
                                                 use_native=False)
        if not native_available():
            import pytest
            pytest.skip("native toolchain unavailable")
        p_nat = graph_parallel.partition_for_ring(g, num_devices=4,
                                                  r_block=64,
                                                  use_native=True)
        for a, b in ((p_np.senders, p_nat.senders),
                     (p_np.recv_local, p_nat.recv_local),
                     (p_np.weights, p_nat.weights)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert p_np.nodes_per_device == p_nat.nodes_per_device
