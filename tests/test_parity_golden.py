"""Golden numerics parity vs independently-generated reference bundles.

tests/golden/golden_env.npz was produced by EXECUTING the reference
implementation (/root/reference/Environment.py) with fixed seeds;
tests/golden/golden_model.npz was produced by TensorFlow/Keras (the
reference's framework family) computing the 3-round GNN-DQN forward pass
with the kron-lifted adjacency, Bellman targets, TF1-semantics Huber loss
and one keras Adam(beta_1=0.5) step. See scripts/make_golden.py.

Unlike tests/oracle.py (a same-author NumPy transcription), these bundles
are the output of *other* implementations, closing the SURVEY.md north-star
loop: per-layer activations and one full replay-update step allclose against
reference semantics given identical weights and inputs.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from gnnra_tpu.agent import dqn
from gnnra_tpu.config import EnvConfig, ModelConfig, TrainConfig
from gnnra_tpu.env import channels, vehicular
from gnnra_tpu.models import gnn_dqn

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

N, R, M, F = 4, 4, 1, 16
GNN_ROUNDS = 3
HEAD_LAYERS = 4


@pytest.fixture(scope="module")
def env_gold():
    return np.load(os.path.join(GOLDEN_DIR, "golden_env.npz"))


@pytest.fixture(scope="module")
def model_gold():
    return np.load(os.path.join(GOLDEN_DIR, "golden_model.npz"))


def state_from_golden(g, prefix, activate):
    """EnvState from the reference's dumped channel realizations.

    Mapping (Environment.py:390-404): V2V_channels_abs = PathLoss + Shadow
    + 50*I; with_fastfading = abs - FastFading, so v2v_fast stores the
    reference's FastFading array directly.
    """
    cfg = EnvConfig()
    n = N
    return vehicular.EnvState(
        positions=jnp.asarray(g[prefix + "positions"], jnp.float32),
        directions=jnp.zeros((n,), jnp.int32),
        velocities=jnp.asarray(g[prefix + "velocities"], jnp.float32),
        shadow_v2v=jnp.zeros((n, n)),
        shadow_v2i=jnp.zeros((n,)),
        v2v_abs=jnp.asarray(g[prefix + "v2v_abs"], jnp.float32),
        v2i_abs=jnp.asarray(g[prefix + "v2i_abs"], jnp.float32),
        v2v_fast=jnp.asarray(g[prefix + "v2v_fast"], jnp.float32),
        v2i_fast=jnp.asarray(g[prefix + "v2i_fast"], jnp.float32),
        destinations=jnp.asarray(g[prefix + "destinations"], jnp.int32),
        activate_links=jnp.asarray(activate),
        v2v_interference_db=jnp.zeros((n, M, R)),
        step=jnp.zeros((), jnp.int32)), cfg


class TestEnvGolden:
    @pytest.mark.parametrize("game", [0, 1])
    def test_v2v_pathloss(self, env_gold, game):
        cfg = EnvConfig()
        pos = jnp.asarray(env_gold[f"g{game}_positions"], jnp.float32)
        got = np.asarray(channels.v2v_pathloss(pos, cfg))
        want = env_gold[f"g{game}_pl_v2v"]
        # the reference zeroes the diagonal implicitly (never computed);
        # compare off-diagonal entries only
        mask = ~np.eye(N, dtype=bool)
        np.testing.assert_allclose(got[mask], want[mask], rtol=2e-4)

    @pytest.mark.parametrize("game", [0, 1])
    def test_v2i_pathloss(self, env_gold, game):
        cfg = EnvConfig()
        pos = jnp.asarray(env_gold[f"g{game}_positions"], jnp.float32)
        got = np.asarray(channels.v2i_pathloss(pos, cfg))
        np.testing.assert_allclose(got, env_gold[f"g{game}_pl_v2i"],
                                   rtol=2e-4)

    @pytest.mark.parametrize("game", [0, 1])
    @pytest.mark.parametrize("aset", [0, 1, 2])
    def test_reward_engine(self, env_gold, game, aset):
        p, q = f"g{game}_", f"g{game}_a{aset}_"
        state, cfg = state_from_golden(env_gold, p,
                                       env_gold[q + "activate_links"])
        actions = jnp.asarray(env_gold[q + "actions"], jnp.int32)
        v2v_rate, v2i_rate, interference = \
            vehicular.compute_reward_with_channel_selection(
                state, actions, cfg)
        np.testing.assert_allclose(np.asarray(v2v_rate),
                                   env_gold[q + "v2v_rate"],
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v2i_rate),
                                   env_gold[q + "v2i_rate"],
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(interference),
                                   env_gold[q + "v2i_interference"],
                                   rtol=2e-4)

    @pytest.mark.parametrize("game", [0, 1])
    @pytest.mark.parametrize("aset", [0, 1, 2])
    def test_interference_obs(self, env_gold, game, aset):
        p, q = f"g{game}_", f"g{game}_a{aset}_"
        state, cfg = state_from_golden(env_gold, p,
                                       env_gold[q + "activate_links"])
        actions = jnp.asarray(env_gold[q + "actions"], jnp.int32)
        got = np.asarray(
            vehicular.compute_interference_obs(state, actions, cfg))
        np.testing.assert_allclose(got, env_gold[q + "interference_obs_db"],
                                   rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# Model golden
# ---------------------------------------------------------------------------

def params_from_golden(g, prefix=""):
    """Stack the TF per-node weights onto the leading node axis."""
    params = {"gnn": [], "head": []}
    for r in range(GNN_ROUNDS):
        params["gnn"].append({
            k: jnp.stack([jnp.asarray(g[f"{prefix}{k}_r{r}_n{i}"])
                          for i in range(N)])
            for k in ("w1", "w2", "w3", "b")})
    for li in range(HEAD_LAYERS):
        params["head"].append({
            "w": jnp.stack([jnp.asarray(g[f"{prefix}hw_l{li}_n{i}"])
                            for i in range(N)]),
            "b": jnp.stack([jnp.asarray(g[f"{prefix}hb_l{li}_n{i}"])
                            for i in range(N)])})
    return params


class TestModelGolden:
    def test_per_layer_activations(self, model_gold):
        cfg = ModelConfig()
        params = params_from_golden(model_gold)
        node = jnp.asarray(model_gold["node"])
        edge = jnp.asarray(model_gold["edge"])
        adj = jnp.asarray(model_gold["adj"])
        q, inter = gnn_dqn.apply_with_intermediates(params, node, edge, adj,
                                                    cfg)
        for r in range(GNN_ROUNDS):
            np.testing.assert_allclose(
                np.asarray(inter["h"][r]), model_gold[f"h_r{r}"],
                rtol=1e-5, atol=1e-5, err_msg=f"round {r} combine")
            np.testing.assert_allclose(
                np.asarray(inter["agg"][r]), model_gold[f"agg_r{r}"],
                rtol=1e-5, atol=1e-5, err_msg=f"round {r} aggregate")
        np.testing.assert_allclose(np.asarray(q), model_gold["q"],
                                   rtol=1e-5, atol=1e-5)

    def test_forward_q(self, model_gold):
        cfg = ModelConfig()
        params = params_from_golden(model_gold)
        q = gnn_dqn.apply(params, jnp.asarray(model_gold["t_node"]),
                          jnp.asarray(model_gold["t_edge"]),
                          jnp.asarray(model_gold["t_adj"]), cfg)
        np.testing.assert_allclose(np.asarray(q), model_gold["t_q_s"],
                                   rtol=1e-5, atol=1e-5)

    def test_bellman_targets(self, model_gold):
        y = dqn.bellman_targets(jnp.asarray(model_gold["t_q_s"]),
                                jnp.asarray(model_gold["t_q_sp"]),
                                jnp.asarray(model_gold["t_actions"]),
                                jnp.asarray(model_gold["t_rewards"]),
                                float(model_gold["gamma"]))
        np.testing.assert_allclose(np.asarray(y), model_gold["t_y"],
                                   rtol=1e-6, atol=1e-6)

    def test_full_replay_update_step(self, model_gold):
        """One full learning step — Bellman + Huber + keras-Adam(beta1=0.5)
        update — lands on the same post-step weights TF/Keras produced."""
        model_cfg = ModelConfig()
        train_cfg = TrainConfig(gamma=float(model_gold["gamma"]))
        assert train_cfg.optimizer == "keras_adam"
        params = params_from_golden(model_gold)
        target_params = params_from_golden(model_gold, prefix="tgt_")
        batch = (jnp.asarray(model_gold["t_node"]),
                 jnp.asarray(model_gold["t_edge"]),
                 jnp.asarray(model_gold["t_adj"]),
                 jnp.asarray(model_gold["t_actions"]),
                 jnp.asarray(model_gold["t_rewards"]),
                 jnp.asarray(model_gold["t_node_next"]),
                 jnp.asarray(model_gold["t_edge_next"]))
        grads, metrics = dqn.grads_from_batch(params, target_params, batch,
                                              model_cfg, train_cfg)
        np.testing.assert_allclose(float(metrics["loss"]),
                                   float(model_gold["t_loss"]), rtol=1e-5)

        opt = dqn.make_optimizer(train_cfg)
        updates, _ = opt.update(grads, opt.init(params))
        import optax
        new_params = optax.apply_updates(params, updates)

        post = params_from_golden(model_gold, prefix="post_")
        for r in range(GNN_ROUNDS):
            for k in ("w1", "w2", "w3", "b"):
                np.testing.assert_allclose(
                    np.asarray(new_params["gnn"][r][k]),
                    np.asarray(post["gnn"][r][k]),
                    rtol=1e-4, atol=1e-5, err_msg=f"gnn[{r}].{k}")
        for li in range(HEAD_LAYERS):
            for k in ("w", "b"):
                np.testing.assert_allclose(
                    np.asarray(new_params["head"][li][k]),
                    np.asarray(post["head"][li][k]),
                    rtol=1e-4, atol=1e-5, err_msg=f"head[{li}].{k}")


# ---------------------------------------------------------------------------
# Reference-executed model golden (BS._create_model run under tf_keras shims)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def refmodel_gold():
    path = os.path.join(GOLDEN_DIR, "golden_refmodel.npz")
    if not os.path.exists(path):
        pytest.skip("golden_refmodel.npz not generated")
    return np.load(path)


class TestReferenceExecutedModel:
    """The strongest wiring check: weights extracted from, and activations
    computed by, the reference's OWN `BS._create_model` graph
    (BS_brain.py:108-216, executed via scripts/make_golden.py part C) —
    not a transcription of it."""

    def test_per_layer_activations_match_reference_graph(self, refmodel_gold):
        g = refmodel_gold
        cfg = ModelConfig()
        params = params_from_golden(g)
        node = jnp.asarray(g["node"])
        edge = jnp.asarray(g["edge"])
        adj = jnp.asarray(g["adj"])
        q, inter = gnn_dqn.apply_with_intermediates(params, node, edge, adj,
                                                    cfg)
        for r in range(GNN_ROUNDS):
            h_ref = np.stack([g[f"ref_h_r{r}_n{i}"] for i in range(N)],
                             axis=1)
            agg_ref = np.stack([g[f"ref_agg_r{r}_n{i}"] for i in range(N)],
                               axis=1)
            np.testing.assert_allclose(
                np.asarray(inter["h"][r]), h_ref, rtol=1e-4, atol=1e-5,
                err_msg=f"round {r} combine vs reference graph")
            np.testing.assert_allclose(
                np.asarray(inter["agg"][r]), agg_ref, rtol=1e-4, atol=1e-5,
                err_msg=f"round {r} aggregate vs reference graph")
        np.testing.assert_allclose(np.asarray(q), g["q"], rtol=1e-4,
                                   atol=1e-5)

    def test_reference_init_statistics(self, refmodel_gold):
        """The extracted glorot_uniform weights bound-check against the
        limit our init uses (same initializer family)."""
        g = refmodel_gold
        w1 = g["w1_r0_n0"]
        limit = np.sqrt(6.0 / (w1.shape[0] + w1.shape[1]))
        assert np.abs(w1).max() <= limit + 1e-6
        assert np.abs(w1).max() > 0.5 * limit       # not degenerate
