"""Pipeline parallelism over GNN message-passing rounds.

New capability (the reference builds its 3 rounds inline on one device,
BS_brain.py:147-166; SURVEY.md §2 marks stage-splitting them across a mesh
axis as the PP plan for deep variants). GPipe-style forward:

  * the rounds + the Q-head are split into S stages; stage s's parameters
    live on mesh slice s of the 'stage' axis;
  * the batch is cut into M microbatches; activations flow stage->stage+1
    via `ppermute` (ICI neighbor hop), so at steady state all S stages
    compute different microbatches concurrently;
  * SPMD-homogeneous body: every device runs the same program and selects
    its stage's round subset with `lax.switch` on its axis index; the final
    stage writes Q-values, combined across the axis with a psum of
    zero-masked buffers.

The pipeline is a pure jittable function — `jax.grad` differentiates through
the ppermutes, giving backward pipelining for free (reverse hops).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gnnra_tpu.config import ModelConfig
from gnnra_tpu.ops import aggregate_dense, gnn_combine


def split_rounds(num_rounds: int, num_stages: int) -> List[List[int]]:
    """Assign GNN rounds to stages contiguously; the Q-head rides on the
    last stage."""
    assert num_stages >= 1
    base = num_rounds // num_stages
    extra = num_rounds % num_stages
    out, r = [], 0
    for s in range(num_stages):
        k = base + (1 if s < extra else 0)
        out.append(list(range(r, r + k)))
        r += k
    return out


def _apply_rounds(params: Any, rounds: Sequence[int], node, edge, h, nbr,
                  adj, cfg: ModelConfig):
    """Run a subset of message-passing rounds (same math as
    models.gnn_dqn.apply)."""
    for r in rounds:
        p = params["gnn"][r]
        a_in = node if r == 0 else jnp.concatenate([h, node], axis=-1)
        act = None if r == cfg.gnn_rounds - 1 else "relu"
        h = gnn_combine(a_in, edge, nbr, p["w1"], p["w2"], p["w3"], p["b"],
                        activation=act)
        nbr = aggregate_dense(h, adj)
    return h, nbr


def _apply_head(params: Any, node, h, nbr):
    x = jnp.concatenate([node, h, nbr], axis=-1)
    n_layers = len(params["head"])
    for li, layer in enumerate(params["head"]):
        x = jnp.einsum("bnd,ndf->bnf", x, layer["w"]) + layer["b"][None]
        if li < n_layers - 1:
            x = jax.nn.relu(x)
    return x


def make_pipelined_forward(mesh: Mesh, cfg: ModelConfig,
                           num_microbatches: int, axis: str = "stage"):
    """Build a jitted pipelined forward: (params, node [B,N,D], edge, adj)
    -> q [B, N, A]. B must divide into num_microbatches. Parameters are
    passed replicated; each stage reads only its own rounds (XLA keeps only
    live buffers per shard when combined with sharded placement)."""
    num_stages = mesh.shape[axis]
    stage_rounds = split_rounds(cfg.gnn_rounds, num_stages)
    f = cfg.num_feedback

    def body(params, node, edge, adj):
        s_idx = jax.lax.axis_index(axis)
        m = num_microbatches
        mb = node.shape[0] // m
        n = node.shape[1]

        def stage_fn(stage, node_mb, edge_mb, adj_mb, h, nbr):
            branches = []
            for s in range(num_stages):
                def mk(s):
                    def f_(operands):
                        node_mb, edge_mb, adj_mb, h, nbr = operands
                        return _apply_rounds(params, stage_rounds[s], node_mb,
                                             edge_mb, h, nbr, adj_mb, cfg)
                    return f_
                branches.append(mk(s))
            return jax.lax.switch(stage, branches,
                                  (node_mb, edge_mb, adj_mb, h, nbr))

        q_out = jnp.zeros((m, mb, n, cfg.n_actions))
        h = jnp.zeros((mb, n, f))
        nbr = jnp.zeros((mb, n, f))
        # pass-through tensors ride with the activations
        node_c = jnp.zeros((mb, n, node.shape[-1]))
        edge_c = jnp.zeros((mb, n, edge.shape[-1]))
        adj_c = jnp.zeros((mb, n, n))
        perm = [(j, j + 1) for j in range(num_stages - 1)]

        def step(t, carry):
            q_out, node_c, edge_c, adj_c, h, nbr = carry
            # stage 0 ingests microbatch t (when valid), others use the
            # permuted activations from the previous step
            valid_in = (t < m)
            mb_idx = jnp.minimum(t, m - 1)
            node_in = jax.lax.dynamic_slice_in_dim(node, mb_idx * mb, mb, 0)
            edge_in = jax.lax.dynamic_slice_in_dim(edge, mb_idx * mb, mb, 0)
            adj_in = (adj if adj.ndim == 2 else
                      jax.lax.dynamic_slice_in_dim(adj, mb_idx * mb, mb, 0))
            adj_in = jnp.broadcast_to(adj_in, (mb, n, n))
            is_first = s_idx == 0
            node_c = jnp.where(is_first & valid_in, node_in, node_c)
            edge_c = jnp.where(is_first & valid_in, edge_in, edge_c)
            adj_c = jnp.where(is_first & valid_in, adj_in, adj_c)
            h = jnp.where(is_first, jnp.zeros_like(h), h)
            nbr = jnp.where(is_first, jnp.zeros_like(nbr), nbr)

            h2, nbr2 = stage_fn(s_idx, node_c, edge_c, adj_c, h, nbr)

            # last stage finishes microbatch t - (S-1)
            done_mb = t - (num_stages - 1)
            is_last = s_idx == num_stages - 1
            q = _apply_head(params, node_c, h2, nbr2)
            write = is_last & (done_mb >= 0)
            q_out = jax.lax.dynamic_update_slice_in_dim(
                q_out,
                jnp.where(write, q, jnp.zeros_like(q))[None],
                jnp.maximum(done_mb, 0), axis=0)

            # hop activations (and pass-throughs) to the next stage
            node_c, edge_c, adj_c, h, nbr = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis, perm),
                (node_c, edge_c, adj_c, h2, nbr2))
            return (q_out, node_c, edge_c, adj_c, h, nbr)

        carry = (q_out, node_c, edge_c, adj_c, h, nbr)
        for t in range(m + num_stages - 1):      # static unroll
            carry = step(t, carry)
        q_out = carry[0]
        # every stage emits its q buffer (zeros except the last stage);
        # out_specs stacks them over the axis and the wrapper slices the
        # last stage's shard — avoids a psum on the output path
        return q_out.reshape(m * mb, n, cfg.n_actions)[None]

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(axis))

    def run(params, node, edge, adj):
        stacked = mapped(params, node, edge, adj)   # [S, B, N, A]
        return stacked[num_stages - 1]

    return jax.jit(run)
