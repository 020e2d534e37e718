"""Tests: pipeline-parallel forward and expert-parallel sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnra_tpu.config import ModelConfig
from gnnra_tpu.models import gnn_dqn
from gnnra_tpu.parallel import mesh as mesh_lib, spmd
from gnnra_tpu.parallel import pp

CFG = ModelConfig()


def make_inputs(batch=8, seed=0):
    rng = np.random.RandomState(seed)
    node = jnp.asarray(rng.randn(batch, 4, 9), jnp.float32)
    edge = jnp.asarray(rng.randn(batch, 4, 4), jnp.float32)
    adj = jnp.asarray((np.ones((4, 4)) - np.eye(4)), jnp.float32)
    return node, edge, adj


class TestSplitRounds:
    def test_even_and_uneven(self):
        assert pp.split_rounds(4, 2) == [[0, 1], [2, 3]]
        assert pp.split_rounds(3, 2) == [[0, 1], [2]]
        assert pp.split_rounds(3, 4) == [[0], [1], [2], []]


class TestPipelineForward:
    @pytest.mark.parametrize("stages,microbatches", [(2, 4), (4, 2), (8, 4)])
    def test_matches_plain_forward(self, stages, microbatches):
        devices = jax.devices()[:stages]
        mesh = mesh_lib.make_mesh((stages,), ("stage",), devices=devices)
        params = gnn_dqn.init_params(jax.random.PRNGKey(0), CFG)
        node, edge, adj = make_inputs()
        fwd = pp.make_pipelined_forward(mesh, CFG, microbatches)
        got = np.asarray(fwd(params, node, edge, adj))
        want = np.asarray(gnn_dqn.apply(params, node, edge, adj, CFG))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("stages,microbatches", [(2, 2), (4, 4)])
    def test_grad_through_pipeline(self, stages, microbatches):
        mesh = mesh_lib.make_mesh((stages,), ("stage",),
                                  devices=jax.devices()[:stages])
        params = gnn_dqn.init_params(jax.random.PRNGKey(1), CFG)
        node, edge, adj = make_inputs(seed=2)
        fwd = pp.make_pipelined_forward(mesh, CFG, microbatches)

        g_pp = jax.grad(lambda p: jnp.sum(fwd(p, node, edge, adj) ** 2))(
            params)
        g_ref = jax.grad(lambda p: jnp.sum(
            gnn_dqn.apply(p, node, edge, adj, CFG) ** 2))(params)
        for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)


class TestTensorParallelWidened:
    def test_dp_tp_train_step_widened_config(self):
        """DP x TP GSPMD training step on a WIDENED model (the regime TP
        exists for — BASELINE config 2 direction: more nodes/RBs, wider
        feedback and head dims), numerically equal to the single-device
        step. Round-1 verdict: TP had only been exercised on the tiny
        parity model."""
        from gnnra_tpu.agent import dqn
        from gnnra_tpu.config import EnvConfig, ModelConfig, TrainConfig
        from gnnra_tpu.env import vehicular

        env_cfg = EnvConfig(n_veh=8, n_rb=8)
        model_cfg = ModelConfig(n_nodes=8, n_rb=8, num_feedback=32,
                                head_hidden=(64, 32, 16))
        train_cfg = TrainConfig(memory_capacity=128, batch_size=16,
                                transitions_per_step=4, num_envs=2)
        key = jax.random.PRNGKey(0)
        agent = dqn.init_agent(key, model_cfg, train_cfg)
        env_states = jax.vmap(
            lambda k: vehicular.new_random_game(k, env_cfg))(
            jax.random.split(jax.random.PRNGKey(1), 2))

        def plain_step(agent, env_states, k):
            k_roll, k_rep = jax.random.split(k)
            agent, env_states, rewards = dqn.rollout_batched(
                agent, env_states, k_roll, env_cfg, model_cfg, train_cfg,
                1000)
            agent, metrics = dqn.replay_update(agent, k_rep, model_cfg,
                                               train_cfg)
            agent = dqn.maybe_sync_target(agent, train_cfg)
            return agent, metrics

        want_agent, want_metrics = jax.jit(plain_step)(
            agent, env_states, jax.random.PRNGKey(2))

        mesh = mesh_lib.make_mesh((2, 4), ("data", "model"))
        tp_agent, tp_envs = spmd.shard_train_state(agent, env_states, mesh)
        # weight output-feature axes really sharded over 'model'
        assert "model" in str(tp_agent.params["gnn"][0]["w1"].sharding.spec)
        step = spmd.make_spmd_train_step(env_cfg, model_cfg, train_cfg, 1000)
        got_agent, _, _, got_metrics = step(tp_agent, tp_envs,
                                            jax.random.PRNGKey(2))

        np.testing.assert_allclose(float(got_metrics["loss"]),
                                   float(want_metrics["loss"]),
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(got_agent.params),
                        jax.tree.leaves(want_agent.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestExpertParallel:
    def test_ep_sharded_forward_matches(self):
        mesh = mesh_lib.make_mesh((2, 4), ("data", "expert"))
        params = gnn_dqn.init_params(jax.random.PRNGKey(3), CFG)
        specs = spmd.expert_param_specs(params)
        from jax.sharding import NamedSharding
        sharded = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            params, specs)
        node, edge, adj = make_inputs(seed=4)
        got = np.asarray(gnn_dqn.apply(sharded, node, edge, adj, CFG))
        want = np.asarray(gnn_dqn.apply(params, node, edge, adj, CFG))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        # weight stacks really are sharded over the expert axis
        w = sharded["gnn"][0]["w1"]
        assert "expert" in str(w.sharding.spec)

    def test_ep_train_step_matches_single_device(self):
        """Full training step (rollout + replay update + Adam) with
        expert-sharded params: gradients and optimizer moments flow through
        the sharding, and the result equals the single-device step."""
        from gnnra_tpu.agent import dqn
        from gnnra_tpu.config import EnvConfig, TrainConfig
        from gnnra_tpu.env import vehicular

        env_cfg = EnvConfig()
        train_cfg = TrainConfig(memory_capacity=256, batch_size=16,
                                transitions_per_step=5, num_envs=2)
        key = jax.random.PRNGKey(0)
        agent = dqn.init_agent(key, CFG, train_cfg)
        env_states = jax.vmap(
            lambda k: vehicular.new_random_game(k, env_cfg))(
            jax.random.split(jax.random.PRNGKey(1), 2))

        # single-device reference step
        def plain_step(agent, env_states, k):
            k_roll, k_rep = jax.random.split(k)
            agent, env_states, rewards = dqn.rollout_batched(
                agent, env_states, k_roll, env_cfg, CFG, train_cfg, 1000)
            agent, metrics = dqn.replay_update(agent, k_rep, CFG, train_cfg)
            agent = dqn.maybe_sync_target(agent, train_cfg)
            return agent, metrics

        want_agent, want_metrics = jax.jit(plain_step)(
            agent, env_states, jax.random.PRNGKey(2))

        mesh = mesh_lib.make_mesh((2, 4), ("data", "expert"))
        ep_agent, ep_envs = spmd.shard_train_state_ep(agent, env_states,
                                                      mesh)
        step = spmd.make_spmd_train_step(env_cfg, CFG, train_cfg, 1000)
        got_agent, _, _, got_metrics = step(ep_agent, ep_envs,
                                            jax.random.PRNGKey(2))

        np.testing.assert_allclose(float(got_metrics["loss"]),
                                   float(want_metrics["loss"]),
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree.leaves(got_agent.params),
                        jax.tree.leaves(want_agent.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
        # Adam moments advanced and stayed expert-sharded
        for a, b in zip(jax.tree.leaves(got_agent.opt_state),
                        jax.tree.leaves(want_agent.opt_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestSparseSpmdTrainStep:
    def test_matches_single_device(self):
        """Node-sharded sparse train step (ring aggregation, 8-dev mesh)
        == the identical step on one device with segment-sum aggregation
        over the same padded graph."""
        import numpy as np
        from jax.sharding import Mesh

        from gnnra_tpu import graph as graph_lib
        from gnnra_tpu.config import ModelConfig
        from gnnra_tpu.models import gnn_dqn_sparse
        from gnnra_tpu.ops import losses, optim
        from gnnra_tpu.parallel import graph_parallel, sparse_spmd
        import optax

        n, d = 1000, 8
        _, g = graph_lib.geometric_interference_graph(0, n, target_degree=6)
        gb, _ = graph_lib.reorder_nodes(g, "bfs")
        mesh = Mesh(np.array(jax.devices()[:d]), ("data",))
        part = graph_parallel.partition_for_ring_windowed(
            gb, num_devices=d, r_block=32, dtype=jnp.float32)
        cfg = ModelConfig(n_nodes=n, num_feedback=8, share_weights=True,
                          head_hidden=(16,))
        step = sparse_spmd.make_sparse_spmd_train_step(
            mesh, part, cfg, gamma=0.5, lr=1e-3)
        n_pad = step.n_pad

        key = jax.random.PRNGKey(0)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        node = jax.random.normal(k1, (n_pad, cfg.node_dim))
        edge = jax.random.normal(k2, (n_pad, cfg.edge_dim))
        node2 = jax.random.normal(k3, (n_pad, cfg.node_dim))
        edge2 = jax.random.normal(k4, (n_pad, cfg.edge_dim))
        actions = jax.random.randint(k5, (n_pad,), 0, cfg.n_rb)
        reward = jnp.float32(1.0)

        state = step.init_state(jax.random.PRNGKey(7))
        batch = step.shard_batch(node, edge, node2, edge2)
        state2, loss = step(state, *batch,
                            jax.device_put(actions), reward,
                            *step.prepare())

        # single-device reference on the padded graph (padding nodes have
        # no edges; identical math)
        g_pad = graph_lib.COOGraph(senders=gb.senders,
                                   receivers=gb.receivers,
                                   weights=gb.weights, num_nodes=n_pad)
        agg = gnn_dqn_sparse.aggregate_coo(g_pad)
        params = gnn_dqn_sparse.init_params(jax.random.PRNGKey(7), cfg)
        opt = optim.keras_adam(1e-3, b1=0.5)

        q_next = gnn_dqn_sparse.apply(params, node2, edge2, agg, cfg)
        bellman = reward + 0.5 * jnp.max(q_next, axis=-1)

        def loss_fn(p):
            q = gnn_dqn_sparse.apply(p, node, edge, agg, cfg)
            t = jax.lax.stop_gradient(q)
            t = t.at[jnp.arange(q.shape[0]), actions].set(bellman)
            return losses.huber_mean(t, q)

        loss_ref, grads = jax.value_and_grad(loss_fn)(params)
        updates, _ = opt.update(grads, opt.init(params), params)
        params_ref = optax.apply_updates(params, updates)

        np.testing.assert_allclose(float(loss), float(loss_ref),
                                   rtol=1e-4, atol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4),
            state2["params"], params_ref)

    def test_feature_major_partition_matches_node_major(self):
        """The sparse train step over a FEATURE-MAJOR banded partition
        (round-5 narrow-F tiles) computes the same loss as over the
        node-major partition — the aggregation is orientation-invariant."""
        import numpy as np
        from jax.sharding import Mesh

        from gnnra_tpu import graph as graph_lib
        from gnnra_tpu.config import ModelConfig
        from gnnra_tpu.parallel import graph_parallel, sparse_spmd

        n, d = 800, 4
        _, g = graph_lib.geometric_interference_graph(1, n, target_degree=6)
        gb, _ = graph_lib.reorder_nodes(g, "bfs")
        mesh = Mesh(np.array(jax.devices()[:d]), ("data",))
        cfg = ModelConfig(n_nodes=n, num_feedback=8, share_weights=True,
                          head_hidden=(16,))
        losses_by_layout = []
        for fm in (False, True):
            part = graph_parallel.partition_for_ring_windowed(
                gb, num_devices=d, r_block=32, dtype=jnp.float32,
                feature_major=fm)
            step = sparse_spmd.make_sparse_spmd_train_step(
                mesh, part, cfg, gamma=0.5, lr=1e-3)
            n_pad = step.n_pad
            k1, k2, k3, k4, k5 = jax.random.split(jax.random.PRNGKey(0), 5)
            batch = step.shard_batch(
                jax.random.normal(k1, (n_pad, cfg.node_dim)),
                jax.random.normal(k2, (n_pad, cfg.edge_dim)),
                jax.random.normal(k3, (n_pad, cfg.node_dim)),
                jax.random.normal(k4, (n_pad, cfg.edge_dim)))
            actions = jax.random.randint(k5, (n_pad,), 0, cfg.n_rb)
            state = step.init_state(jax.random.PRNGKey(7))
            _, loss = step(state, *batch, jax.device_put(actions),
                           jnp.float32(1.0), *step.prepare())
            losses_by_layout.append(float(loss))
        np.testing.assert_allclose(losses_by_layout[0],
                                   losses_by_layout[1],
                                   rtol=1e-5, atol=1e-6)
