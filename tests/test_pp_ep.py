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
