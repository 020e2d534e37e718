"""GNN-DQN model: K-round interference-graph message passing + per-node Q-heads.

TPU-native re-design of `BS._create_model` (reference BS_brain.py:108-216).
The reference unrolls one Keras subgraph per V2V pair (13 named inputs, 4
outputs, kron-lifted 64x64 adjacency); here the whole network is two batched
einsum stacks over a node axis:

  round 1: h = relu(node@W1 + edge@W2 + 0@W3 + b)          (BS_brain.py:147-150)
  agg     = A^T-weighted sum of node features               (BS_brain.py:152)
  round k: h = relu([h,node]@W1 + edge@W2 + agg@W3 + b)     (BS_brain.py:154-157)
  final round is linear                                     (BS_brain.py:161-164)
  out     = [h, agg]; q = MLP_80_40_20([node, out])         (BS_brain.py:168-200)

Weights are *unshared* across nodes and rounds exactly like the reference
(despite its "Share Weights" comments — see SURVEY.md C14); they are stacked
on a leading node axis so XLA sees a handful of large batched matmuls on the
MXU instead of 4x(3+4) small ones. A shared-weight variant supports scaled
configs with arbitrary node counts.

Params are a plain nested-dict pytree; the target network is simply a second
copy of the pytree (reference BS_brain.py:105-106, 237-239).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from gnnra_tpu.config import ModelConfig
from gnnra_tpu.ops import (aggregate_dense, gnn_combine, gnn_combine_shared)

Params = Dict[str, Any]


def glorot_uniform(key: jax.Array, shape, fan_in: int, fan_out: int,
                   dtype=jnp.float32) -> jax.Array:
    """Keras glorot_uniform: U(-limit, limit), limit = sqrt(6/(fi+fo))
    (reference BS_brain.py:26-37 uses initializer='glorot_uniform')."""
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def _round_in_dims(cfg: ModelConfig, round_idx: int):
    """(node-ish, edge, neighbor) input dims of a message-passing round."""
    f = cfg.num_feedback
    a_dim = cfg.node_dim if round_idx == 0 else f + cfg.node_dim
    return a_dim, cfg.edge_dim, f


def init_params(key: jax.Array, cfg: ModelConfig) -> Params:
    """Initialize the full parameter pytree."""
    n = cfg.n_nodes
    f = cfg.num_feedback
    per_node = () if cfg.share_weights else (n,)
    params: Params = {"gnn": [], "head": []}
    keys = jax.random.split(key, cfg.gnn_rounds + len(cfg.head_hidden) + 1)

    for r in range(cfg.gnn_rounds):
        a_dim, e_dim, c_dim = _round_in_dims(cfg, r)
        k1, k2, k3 = jax.random.split(keys[r], 3)
        params["gnn"].append({
            "w1": glorot_uniform(k1, per_node + (a_dim, f), a_dim, f),
            "w2": glorot_uniform(k2, per_node + (e_dim, f), e_dim, f),
            "w3": glorot_uniform(k3, per_node + (c_dim, f), c_dim, f),
            "b": jnp.zeros(per_node + (f,)),
        })

    head_in = cfg.node_dim + 2 * f
    dims = (head_in,) + cfg.head_hidden + (cfg.n_actions,)
    for li in range(len(dims) - 1):
        k = keys[cfg.gnn_rounds + li]
        params["head"].append({
            "w": glorot_uniform(k, per_node + (dims[li], dims[li + 1]),
                                dims[li], dims[li + 1]),
            "b": jnp.zeros(per_node + (dims[li + 1],)),
        })
    return params


def apply(params: Params, node: jax.Array, edge: jax.Array, adj: jax.Array,
          cfg: ModelConfig) -> jax.Array:
    """Forward pass.

    Args:
      params: pytree from `init_params`.
      node: [B, N, node_dim] per-node observations.
      edge: [B, N, edge_dim].
      adj: [B, N, N] or [N, N] adjacency (aggregation uses A^T, matching the
        reference's batch_dot axes — see ops.aggregate_dense).
      cfg: static model config.

    Returns q-values [B, N, n_actions].
    """
    compute_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    node = node.astype(compute_dtype)
    edge = edge.astype(compute_dtype)
    adj = adj.astype(compute_dtype)
    combine = gnn_combine_shared if cfg.share_weights else gnn_combine

    def cast(tree):
        return jax.tree.map(lambda x: x.astype(compute_dtype), tree)

    b_dim, n = node.shape[0], node.shape[1]
    f = cfg.num_feedback
    nbr = jnp.zeros((b_dim, n, f), compute_dtype)  # zero initial neighbor
                                                   # features (BS_brain.py:478)
    h = None
    for r in range(cfg.gnn_rounds):
        p = cast(params["gnn"][r])
        a_in = node if r == 0 else jnp.concatenate([h, node], axis=-1)
        act = None if r == cfg.gnn_rounds - 1 else "relu"
        h = combine(a_in, edge, nbr, p["w1"], p["w2"], p["w3"], p["b"],
                    activation=act)
        nbr = aggregate_dense(h, adj)

    x = jnp.concatenate([node, h, nbr], axis=-1)   # [B, N, node+2F]
    n_layers = len(params["head"])
    for li, layer in enumerate(params["head"]):
        p = cast(layer)
        if cfg.share_weights:
            x = jnp.einsum("bnd,df->bnf", x, p["w"]) + p["b"][None, None]
        else:
            x = jnp.einsum("bnd,ndf->bnf", x, p["w"]) + p["b"][None]
        if li < n_layers - 1:
            x = jax.nn.relu(x)
    return x.astype(jnp.float32)


def apply_with_intermediates(params: Params, node: jax.Array,
                             edge: jax.Array, adj: jax.Array,
                             cfg: ModelConfig):
    """Forward pass that also returns per-round activations, for the
    numerics-parity harness (SURVEY.md: per-layer allclose against an
    independently-derived oracle given identical weights and inputs).

    Returns (q [B,N,A], {"h": [rounds][B,N,F], "agg": [rounds][B,N,F]}).
    """
    combine = gnn_combine_shared if cfg.share_weights else gnn_combine
    b_dim, n = node.shape[0], node.shape[1]
    f = cfg.num_feedback
    nbr = jnp.zeros((b_dim, n, f), node.dtype)
    inter = {"h": [], "agg": []}
    h = None
    for r in range(cfg.gnn_rounds):
        p = params["gnn"][r]
        a_in = node if r == 0 else jnp.concatenate([h, node], axis=-1)
        act = None if r == cfg.gnn_rounds - 1 else "relu"
        h = combine(a_in, edge, nbr, p["w1"], p["w2"], p["w3"], p["b"],
                    activation=act)
        nbr = aggregate_dense(h, adj)
        inter["h"].append(h)
        inter["agg"].append(nbr)

    x = jnp.concatenate([node, h, nbr], axis=-1)
    n_layers = len(params["head"])
    for li, layer in enumerate(params["head"]):
        if cfg.share_weights:
            x = jnp.einsum("bnd,df->bnf", x, layer["w"]) + layer["b"][None, None]
        else:
            x = jnp.einsum("bnd,ndf->bnf", x, layer["w"]) + layer["b"][None]
        if li < n_layers - 1:
            x = jax.nn.relu(x)
    return x, inter


def apply_single(params: Params, node: jax.Array, edge: jax.Array,
                 adj: jax.Array, cfg: ModelConfig) -> jax.Array:
    """Unbatched forward: node [N, D] -> q [N, A] (predict_one_step analog,
    reference BS_brain.py:233-235)."""
    q = apply(params, node[None], edge[None], adj[None] if adj.ndim == 2
              else adj, cfg)
    return q[0]


def update_target(online: Params, target: Optional[Params] = None) -> Params:
    """Hard target-network sync: copy online weights (reference
    BS_brain.py:237-239)."""
    del target
    return jax.tree.map(lambda x: x, online)
