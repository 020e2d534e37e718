"""Pipeline parallelism over GNN message-passing rounds.

New capability (the reference builds its 3 rounds inline on one device,
BS_brain.py:147-166; SURVEY.md §2 marks stage-splitting them across a mesh
axis as the PP plan for deep variants). GPipe-style schedule:

  * rounds are made structurally uniform (round 0's W1 is zero-padded on the
    h-block so every round computes `combine(concat(h, node), edge, nbr)`,
    with per-round relu/enabled flags) and stacked on a leading round axis;
  * the stack is reshaped to [num_stages, rounds_per_stage, ...] and sharded
    over the 'stage' mesh axis through shard_map in_specs — each device
    holds ONLY its own stage's weights (true pipeline partitioning);
  * the batch is cut into M microbatches; activations flow stage->stage+1
    via `ppermute` (ICI neighbor hop), so at steady state all S stages
    compute different microbatches concurrently;
  * the schedule is statically unrolled (M + S - 1 ticks); microbatch i's
    Q-values are simply the tick-(i+S-1) output of the last stage, so there
    is no on-device accumulation buffer at all.

Every device runs the same program with no data-dependent control flow
(`lax.switch`-free — per-round behavior differences are weight-independent
`jnp.where` flags), so `jax.grad` differentiates the whole pipeline and the
ppermute transposes give backward pipelining for free (reverse hops).
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gnnra_tpu.config import ModelConfig
from gnnra_tpu.ops import aggregate_dense


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


def _stack_stage_params(params: Any, cfg: ModelConfig, num_stages: int):
    """Uniformize + stack per-round GNN weights to [S, k, ...].

    Round 0's W1 acts on node only ([..., node_dim, F]); later rounds act on
    concat(h, node) ([..., F+node_dim, F]). Zero-padding round 0's h-block
    makes them identical: h entering round 0 is zeros anyway, and the zero
    rows also receive zero gradient cotangents, so autodiff through the pad
    recovers exactly the original round-0 W1 gradient.

    Rounds are padded up to S*k with disabled pass-through rounds (zero
    weights, enabled=False).
    """
    rounds = params["gnn"]
    num_rounds = len(rounds)
    k = -(-num_rounds // num_stages)          # ceil
    total = k * num_stages
    in_dim = cfg.num_feedback + cfg.node_dim

    w1s, w2s, w3s, bs = [], [], [], []
    relu_flags, enabled = [], []
    for r in range(total):
        if r < num_rounds:
            p = rounds[r]
            w1 = p["w1"]
            if w1.shape[-2] < in_dim:          # round 0: pad the h-block
                pad_shape = w1.shape[:-2] + (in_dim - w1.shape[-2],
                                             w1.shape[-1])
                w1 = jnp.concatenate(
                    [jnp.zeros(pad_shape, w1.dtype), w1], axis=-2)
            w1s.append(w1)
            w2s.append(p["w2"])
            w3s.append(p["w3"])
            bs.append(p["b"])
            relu_flags.append(r != num_rounds - 1)
            enabled.append(True)
        else:                                  # pad round: pass-through
            w1s.append(jnp.zeros_like(w1s[0]))
            w2s.append(jnp.zeros_like(w2s[0]))
            w3s.append(jnp.zeros_like(w3s[0]))
            bs.append(jnp.zeros_like(bs[0]))
            relu_flags.append(False)
            enabled.append(False)

    def stage_shape(x):
        return x.reshape((num_stages, k) + x.shape[1:])

    return {
        "w1": stage_shape(jnp.stack(w1s)),
        "w2": stage_shape(jnp.stack(w2s)),
        "w3": stage_shape(jnp.stack(w3s)),
        "b": stage_shape(jnp.stack(bs)),
        "relu": jnp.asarray(relu_flags).reshape(num_stages, k),
        "enabled": jnp.asarray(enabled).reshape(num_stages, k),
    }, k


def _combine(a, e, c, w1, w2, w3, b, shared: bool):
    """Linear part of ops.gnn_combine for per-node or shared weight stacks."""
    if shared:
        return (jnp.einsum("bnd,df->bnf", a, w1)
                + jnp.einsum("bnd,df->bnf", e, w2)
                + jnp.einsum("bnd,df->bnf", c, w3) + b[None, None])
    return (jnp.einsum("bnd,ndf->bnf", a, w1)
            + jnp.einsum("bnd,ndf->bnf", e, w2)
            + jnp.einsum("bnd,ndf->bnf", c, w3) + b[None])


def _apply_head(params: Any, node, h, nbr, shared: bool):
    x = jnp.concatenate([node, h, nbr], axis=-1)
    n_layers = len(params["head"])
    for li, layer in enumerate(params["head"]):
        if shared:
            x = jnp.einsum("bnd,df->bnf", x, layer["w"]) + layer["b"][None,
                                                                      None]
        else:
            x = jnp.einsum("bnd,ndf->bnf", x, layer["w"]) + layer["b"][None]
        if li < n_layers - 1:
            x = jax.nn.relu(x)
    return x


def make_pipelined_forward(mesh: Mesh, cfg: ModelConfig,
                           num_microbatches: int, axis: str = "stage"):
    """Build a jitted pipelined forward: (params, node [B,N,D], edge, adj)
    -> q [B, N, A]. B must divide into num_microbatches. GNN round weights
    are sharded over the stage axis (each device holds only its rounds);
    head weights ride replicated and are applied (masked) on the last
    stage's tick output."""
    num_stages = mesh.shape[axis]
    f = cfg.num_feedback
    shared = cfg.share_weights

    def body(stk, head_params, node, edge, adj):
        # stk leaves arrive sharded: local shape [1, k, ...]
        m = num_microbatches
        mb = node.shape[0] // m
        n = node.shape[1]
        k = stk["relu"].shape[1]
        s_idx = jax.lax.axis_index(axis)

        def run_local_rounds(node_mb, edge_mb, adj_mb, h, nbr):
            a_in_dim = f + node_mb.shape[-1]
            for j in range(k):
                w1 = stk["w1"][0, j]
                if w1.shape[-2] != a_in_dim:
                    raise ValueError("stacked W1 in_dim mismatch")
                a_in = jnp.concatenate([h, node_mb], axis=-1)
                z = _combine(a_in, edge_mb, nbr, w1, stk["w2"][0, j],
                             stk["w3"][0, j], stk["b"][0, j], shared)
                z = jnp.where(stk["relu"][0, j], jax.nn.relu(z), z)
                en = stk["enabled"][0, j]
                h = jnp.where(en, z, h)
                nbr = jnp.where(en, aggregate_dense(h, adj_mb), nbr)
            return h, nbr

        h = jnp.zeros((mb, n, f))
        nbr = jnp.zeros((mb, n, f))
        # pass-through tensors ride with the activations
        node_c = jnp.zeros((mb, n, node.shape[-1]))
        edge_c = jnp.zeros((mb, n, edge.shape[-1]))
        adj_c = jnp.zeros((mb, n, n))
        perm = [(j, j + 1) for j in range(num_stages - 1)]

        qs = []
        for t in range(m + num_stages - 1):     # static GPipe schedule
            # stage 0 ingests microbatch t (when valid), others use the
            # permuted activations from the previous tick
            valid_in = (t < m)
            mb_idx = min(t, m - 1)
            node_in = jax.lax.slice_in_dim(node, mb_idx * mb,
                                           (mb_idx + 1) * mb, axis=0)
            edge_in = jax.lax.slice_in_dim(edge, mb_idx * mb,
                                           (mb_idx + 1) * mb, axis=0)
            adj_in = (adj if adj.ndim == 2 else
                      jax.lax.slice_in_dim(adj, mb_idx * mb,
                                           (mb_idx + 1) * mb, axis=0))
            adj_in = jnp.broadcast_to(adj_in, (mb, n, n))
            is_first = s_idx == 0
            ingest = is_first & valid_in
            node_c = jnp.where(ingest, node_in, node_c)
            edge_c = jnp.where(ingest, edge_in, edge_c)
            adj_c = jnp.where(ingest, adj_in, adj_c)
            h = jnp.where(is_first, jnp.zeros_like(h), h)
            nbr = jnp.where(is_first, jnp.zeros_like(nbr), nbr)

            h2, nbr2 = run_local_rounds(node_c, edge_c, adj_c, h, nbr)

            # the last stage finishes microbatch t-(S-1) at this tick; the
            # head output is only meaningful there, and the wrapper below
            # slices exactly the last stage's shard, so no masking needed
            if t >= num_stages - 1:
                qs.append(_apply_head(head_params, node_c, h2, nbr2, shared))

            # hop activations (and pass-throughs) to the next stage
            node_c, edge_c, adj_c, h, nbr = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis, perm),
                (node_c, edge_c, adj_c, h2, nbr2))

        q_out = jnp.concatenate(qs, axis=0)      # [m*mb, n, A]
        return q_out[None]

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P()),
        out_specs=P(axis))

    def run(params, node, edge, adj):
        stk, _ = _stack_stage_params(params, cfg, num_stages)
        head = {"head": params["head"]}
        stacked = mapped(stk, head, node, edge, adj)   # [S, B, N, A]
        return stacked[num_stages - 1]

    return jax.jit(run)
