"""GSPMD training: full train step under jit with sharding annotations.

Complement to the explicit shard_map path (parallel/dp.py): here we place the
train state on a 2D ('data', 'model') mesh with `jax.device_put` +
NamedSharding and let XLA's SPMD partitioner insert the collectives —
gradient allreduce over 'data' (DP), and tensor-parallel resharding of the
per-node Q-head weights over 'model' (TP). Computation follows data: a plain
`jax.jit` of the same single-device train step code runs partitioned.

TP axis choice: the decision-MLP hidden dims (80/40/20, reference
BS_brain.py:176-178) and the GNN feature dim are sharded on their output
feature axis; with the parity model these are small, but the same spec scales
to the widened configs (BASELINE.json config 2).
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnnra_tpu.agent import dqn
from gnnra_tpu.config import EnvConfig, ModelConfig, TrainConfig
from gnnra_tpu.env import vehicular


# Leaf names the model pytree may contain, with the meaning of their axes.
# models/gnn_dqn.py stacks every leaf as [*per_node, in_features..., out];
# the TRAILING axis is always output features and the LEADING axis (when the
# leaf has a per-node stack, ndim >= 2 for 'b', >= 3 for weights) is the
# node/expert axis. Any new param family must be registered here — the spec
# functions refuse unknown leaf names rather than guessing from ndim.
_KNOWN_LEAF_NAMES = frozenset({"w", "w1", "w2", "w3", "b"})


def _leaf_name(path) -> str:
    last = path[-1]
    return getattr(last, "key", getattr(last, "idx", last))


def _check_known(path, leaf) -> str:
    name = _leaf_name(path)
    if name not in _KNOWN_LEAF_NAMES:
        raise ValueError(
            f"param leaf {jax.tree_util.keystr(path)!r} (shape {leaf.shape}) "
            f"is not a registered weight family {sorted(_KNOWN_LEAF_NAMES)}; "
            "add it to parallel/spmd._KNOWN_LEAF_NAMES with the right axis "
            "convention before sharding it")
    return name


def param_specs(params: Any, model_axis: str = "model") -> Any:
    """PartitionSpecs for the parameter pytree: shard every weight's output
    feature axis over the model axis, biases likewise.

    Leaf-name aware: only the registered families (whose trailing axis is
    known to be output features) are sharded; an unknown leaf name raises
    instead of silently getting an ndim-guessed spec."""

    def spec_for(path, leaf):
        _check_known(path, leaf)
        ndim = leaf.ndim
        if ndim == 0:
            return P()
        # trailing axis == output features for every registered family
        return P(*([None] * (ndim - 1) + [model_axis]))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def expert_param_specs(params: Any, expert_axis: str = "expert") -> Any:
    """Expert-parallel PartitionSpecs: the per-node unshared weight stacks
    (leading node axis, reference BS_brain.py:121-200's per-D2D subnets) are
    structurally a fixed-routing mixture-of-experts (SURVEY.md §2 EP row);
    sharding the node axis places each node's GNN/Q-head expert on its own
    device slice. Leaf-name aware like `param_specs`: leaves whose leading
    axis is NOT a node stack (shared-weight 'w' [in,out] / 'b' [out]) stay
    replicated."""

    def spec_for(path, leaf):
        name = _check_known(path, leaf)
        node_stacked = leaf.ndim >= (2 if name == "b" else 3)
        if not node_stacked:
            return P()
        return P(*([expert_axis] + [None] * (leaf.ndim - 1)))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_train_state(agent: dqn.AgentState, env_states: vehicular.EnvState,
                      mesh: Mesh, data_axis: str = "data",
                      model_axis: str = "model"
                      ) -> Tuple[dqn.AgentState, vehicular.EnvState]:
    """device_put the state: params/opt TP-sharded over `model_axis`,
    replay + envs DP-sharded over `data_axis`."""

    def put(tree, specs):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs)

    p_specs = param_specs(agent.params, model_axis)
    params = put(agent.params, p_specs)
    target = put(agent.target_params, p_specs)
    # optimizer state mirrors param shapes where leaves match; everything
    # else is replicated
    def opt_spec(leaf):
        return P(*([None] * (leaf.ndim - 1) + [model_axis])) \
            if leaf.ndim >= 1 else P()
    opt_state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, opt_spec(x))),
        agent.opt_state)

    def replay_spec(leaf):
        return P(data_axis) if leaf.ndim >= 1 else P()
    rep = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, replay_spec(x))),
        agent.replay)

    env_sharded = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(data_axis) if x.ndim >= 1 else P())),
        env_states)

    agent = agent.replace(params=params, target_params=target,
                          opt_state=opt_state, replay=rep)
    return agent, env_sharded


def shard_train_state_ep(agent: dqn.AgentState,
                         env_states: vehicular.EnvState, mesh: Mesh,
                         data_axis: str = "data",
                         expert_axis: str = "expert"
                         ) -> Tuple[dqn.AgentState, vehicular.EnvState]:
    """device_put the state for expert-parallel TRAINING: the per-node
    weight stacks (and their Adam moments) sharded over `expert_axis`,
    replay + envs DP-sharded over `data_axis`. The same
    `make_spmd_train_step` then runs the full rollout + replay-update +
    target-sync step with XLA-inserted collectives; gradients of the
    node-stacked einsums are themselves node-stacked, so grads and Adam
    moments never leave their expert shard."""
    e_specs = expert_param_specs(agent.params, expert_axis)

    def put(tree, specs):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs)

    params = put(agent.params, e_specs)
    target = put(agent.target_params, e_specs)
    # Adam moments mirror the param stacks leaf-for-leaf; scalars (step
    # count) replicate.
    opt_state = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(
            mesh, P(*([expert_axis] + [None] * (x.ndim - 1)))
            if x.ndim >= 2 else P())),
        agent.opt_state)
    rep = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(data_axis) if x.ndim >= 1 else P())),
        agent.replay)
    env_sharded = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(data_axis) if x.ndim >= 1 else P())),
        env_states)
    agent = agent.replace(params=params, target_params=target,
                          opt_state=opt_state, replay=rep)
    return agent, env_sharded


def make_spmd_train_step(env_cfg: EnvConfig, model_cfg: ModelConfig,
                         train_cfg: TrainConfig, total_env_steps: int,
                         mesh: Mesh | None = None,
                         data_axis: str = "data"):
    """Jitted (agent, env_states [E, ...], key) -> (agent', env_states',
    rewards, metrics); partitioning follows the input shardings.

    When `mesh` is given, the replay ring is PINNED to `P(data_axis)` (rows
    sharded over the data axis) at the step boundaries with
    with_sharding_constraint. Without the pin, SPMD sharding propagation
    walks backward from the TP/EP-sharded model consumers and decides the
    ring's gather input should be COLUMN-sharded over the model/expert
    axis, then reconciles with the row-sharded parameter via "involuntary
    full rematerialization" — replicate-then-repartition of the whole
    buffer every step (harmless at dryrun shapes; catastrophic at the real
    1M x 125 = 500 MB ring). The pin keeps the ring row-sharded end to
    end: the burst DUS append and the [B]-row sampling gather both run on
    the row-sharded layout, and only the gathered [B, row] batch (tiny)
    reshards toward the model's layout. tests/test_parallel.py asserts the
    compile emits no rematerialization warning on an 8-device mesh."""

    roll_b = (dqn.rollout_batched_parallel if train_cfg.parallel_rollout
              else dqn.rollout_batched)

    if mesh is not None:
        def pin_replay(agent: dqn.AgentState) -> dqn.AgentState:
            rep = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(
                        mesh, P(data_axis) if x.ndim >= 1 else P())),
                agent.replay)
            return agent.replace(replay=rep)
    else:
        def pin_replay(agent: dqn.AgentState) -> dqn.AgentState:
            return agent

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(agent: dqn.AgentState, env_states: vehicular.EnvState,
             key: jax.Array):
        k_roll, k_replay = jax.random.split(key)
        agent = pin_replay(agent)
        agent, env_states, rewards = roll_b(
            agent, env_states, k_roll, env_cfg, model_cfg, train_cfg,
            total_env_steps)
        agent = pin_replay(agent)
        agent, metrics = dqn.replay_update(agent, k_replay, model_cfg,
                                           train_cfg)
        agent = pin_replay(agent)
        agent = dqn.maybe_sync_target(agent, train_cfg)
        return agent, env_states, rewards, metrics

    return step
