"""Message-passing primitives: combine + neighborhood aggregation.

Re-designs the reference's Keras custom layers as pure batched array ops:
  * `GNNLayer.call` (reference BS_brain.py:44-51): per-node combine
    out = act(a@W1 + b@W2 + c@W3 + bias).
  * `AggLayer.call` (reference BS_brain.py:69-76): the reference concatenates
    the four 16-dim node features into a 64-vector and contracts with a
    kron-lifted 64x64 block adjacency; algebraically that is exactly
    agg_j = sum_i A[i, j] * h_i, which we compute directly as a batched
    [B,N,F] x [B,N,N] einsum (MXU-friendly) — no kron lift, no per-node
    unrolling, works for any N.

For large graphs the dense [N, N] form is replaced by sparse segment-sum /
Pallas SpMM (see gnnra_tpu.ops.spmm); `aggregate_dense` stays the semantic
oracle.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def gnn_combine(node: jax.Array, edge: jax.Array, nbr: jax.Array,
                w1: jax.Array, w2: jax.Array, w3: jax.Array, b: jax.Array,
                activation: Optional[str] = "relu") -> jax.Array:
    """Per-node combine with per-node (unshared) weights.

    Args:
      node: [B, N, Da] node features.
      edge: [B, N, Db] edge features.
      nbr:  [B, N, Dc] aggregated neighbor features.
      w1/w2/w3: [N, D*, F] per-node weight stacks (the reference instantiates
        a separate GNNLayer per node and per round, BS_brain.py:121-164; we
        stack them on a leading node axis and contract in one batched einsum).
      b: [N, F].
      activation: "relu" | None (round 3 is linear, BS_brain.py:161-164).

    Returns [B, N, F].
    """
    out = (jnp.einsum("bnd,ndf->bnf", node, w1)
           + jnp.einsum("bnd,ndf->bnf", edge, w2)
           + jnp.einsum("bnd,ndf->bnf", nbr, w3)
           + b[None])
    if activation == "relu":
        out = jax.nn.relu(out)
    elif activation is not None:
        raise ValueError(f"unsupported activation: {activation}")
    return out


def gnn_combine_shared(node: jax.Array, edge: jax.Array, nbr: jax.Array,
                       w1: jax.Array, w2: jax.Array, w3: jax.Array,
                       b: jax.Array,
                       activation: Optional[str] = "relu") -> jax.Array:
    """Shared-weight variant (one weight set for all nodes) for scaled
    configs where per-node weights do not make sense; w*: [D*, F], b: [F]."""
    out = (jnp.einsum("bnd,df->bnf", node, w1)
           + jnp.einsum("bnd,df->bnf", edge, w2)
           + jnp.einsum("bnd,df->bnf", nbr, w3)
           + b[None, None])
    if activation == "relu":
        out = jax.nn.relu(out)
    elif activation is not None:
        raise ValueError(f"unsupported activation: {activation}")
    return out


def aggregate_dense(h: jax.Array, adj: jax.Array) -> jax.Array:
    """Dense neighborhood aggregation: agg_j = sum_i adj[i, j] * h_i.

    Semantics of `AggLayer` (reference BS_brain.py:69-76): batch_dot with
    axes=[1,1] on the kron-lifted block adjacency is A^T contraction over the
    node axis.

    Args:
      h: [B, N, F] node features.
      adj: [B, N, N] (or [N, N], broadcast over batch).
    Returns [B, N, F].
    """
    if adj.ndim == 2:
        return jnp.einsum("bif,ij->bjf", h, adj)
    return jnp.einsum("bif,bij->bjf", h, adj)


def aggregate_sparse(h: jax.Array, senders: jax.Array, receivers: jax.Array,
                     num_nodes: int,
                     edge_weight: Optional[jax.Array] = None) -> jax.Array:
    """Sparse neighborhood aggregation over COO edges (segment-sum).

    agg[j] = sum over edges e with receivers[e]==j of h[senders[e]] * w_e.
    Equivalent to `aggregate_dense` with adj[i,j] = sum of w_e over edges
    (i -> j); used for arbitrary-size interference graphs where the dense
    [N, N] form does not fit.

    Args:
      h: [N, F] node features (unbatched; vmap for batches).
      senders/receivers: [E] int32, static length (pad with self-loops of
        weight 0 for jit-stable shapes).
      num_nodes: static N.
      edge_weight: optional [E] weights (mask padding with 0).
    Returns [N, F].
    """
    msgs = h[senders]
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None]
    return jax.ops.segment_sum(msgs, receivers, num_segments=num_nodes)
