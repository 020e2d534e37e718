"""Sparse-aggregation GNN-DQN for large interference graphs.

The dense model (models/gnn_dqn.py) carries an [N, N] adjacency — exact
reference semantics, fine to a few hundred nodes. This variant swaps the
dense contraction for sparse neighborhood aggregation over COO/blocked edges
(ops.spmm: segment-sum oracle or the Pallas blocked kernel), with
shared-per-node weights (ModelConfig.share_weights=True), scaling the same
3-round architecture to the synthetic 100k-node configs (BASELINE 4-5).

The aggregate is injected as a closure so the same forward serves:
  * aggregate_coo(graph)            — segment-sum (oracle / small graphs)
  * make_spmm(fwd_blk, bwd_blk)     — Pallas kernel with custom VJP
  * aggregate_blocked(fwd, bwd)     — same, incl. two-level layouts
  * make_ring_spmm(mesh, part, f)   — multi-chip halo-exchange ring
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from gnnra_tpu.config import ModelConfig
from gnnra_tpu.graph import COOGraph
from gnnra_tpu.models import gnn_dqn
from gnnra_tpu.ops import spmm as spmm_lib

AggregateFn = Callable[[jax.Array], jax.Array]   # [N, F] -> [N, F]


def aggregate_coo(graph: COOGraph) -> AggregateFn:
    """Segment-sum aggregation closure (differentiable through JAX)."""
    return lambda h: spmm_lib.spmm_coo(h, graph)


def aggregate_fixed_degree(fd) -> AggregateFn:
    """Sampled-neighborhood aggregation (graph.FixedDegreeGraph from
    `graph.sample_neighbors`): unbiased estimator of the full aggregation,
    gather-only forward — the BASELINE config 4 sampling path. Resample per
    step (new key -> new fd) for fresh estimator noise."""
    return lambda h: spmm_lib.spmm_fixed_degree(h, fd)


def aggregate_blocked(fwd_layout, bwd_layout,
                      impl: str = "pallas") -> AggregateFn:
    """Differentiable blocked-kernel aggregation over a single-level
    (`graph.block_by_receiver`) or two-level (`graph.block_two_level`,
    the >100 MB-table locality fix) layout pair.

    The returned closure captures the layouts; under jit they lower as
    program constants, which is fine to ~10M edges. Beyond that, pass the
    layouts as jit ARGUMENTS and call `spmm.make_spmm_call` directly —
    constant-embedding 100s of MB of layout overflows remote-compile
    transports (docs/RESULTS.md)."""
    call = spmm_lib.make_spmm_call(impl=impl)
    return lambda h: call(h, fwd_layout, bwd_layout)


def init_params(key: jax.Array, cfg: ModelConfig):
    """Shared-weight parameter pytree (cfg.share_weights must be True)."""
    assert cfg.share_weights, "sparse model uses shared per-node weights"
    return gnn_dqn.init_params(key, cfg)


def apply(params, node: jax.Array, edge: jax.Array,
          aggregate: AggregateFn, cfg: ModelConfig,
          remat: bool = False) -> jax.Array:
    """Forward over one graph: node [N, D], edge [N, De] -> q [N, A].

    Same round structure as the dense model (reference BS_brain.py:147-200);
    aggregation happens through the injected sparse op.

    remat=True wraps each message-passing round in `jax.checkpoint`: the
    backward pass recomputes round activations instead of keeping
    2 x rounds x [N, F] buffers live — at 100k+ nodes that trades a cheap
    re-forward for hundreds of MB of HBM, the standard TPU
    rematerialization move for deep variants.
    """
    compute_dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    node = node.astype(compute_dtype)
    edge = edge.astype(compute_dtype)
    n = node.shape[0]
    f = cfg.num_feedback

    def dense(x, w, b):
        return jnp.einsum("nd,df->nf", x, w.astype(compute_dtype)) \
            + b.astype(compute_dtype)[None]

    def round_fn(r, p, h, nbr):
        a_in = node if r == 0 else jnp.concatenate([h, node], axis=-1)
        out = (dense(a_in, p["w1"], p["b"])
               + jnp.einsum("nd,df->nf", edge, p["w2"].astype(compute_dtype))
               + jnp.einsum("nd,df->nf", nbr, p["w3"].astype(compute_dtype)))
        h = out if r == cfg.gnn_rounds - 1 else jax.nn.relu(out)
        nbr = aggregate(h.astype(jnp.float32)).astype(compute_dtype)
        return h, nbr

    nbr = jnp.zeros((n, f), compute_dtype)
    h = jnp.zeros((n, f), compute_dtype)
    for r in range(cfg.gnn_rounds):
        fn = (jax.checkpoint(round_fn, static_argnums=(0,)) if remat
              else round_fn)
        h, nbr = fn(r, params["gnn"][r], h, nbr)

    x = jnp.concatenate([node, h, nbr], axis=-1)
    n_layers = len(params["head"])
    for li, layer in enumerate(params["head"]):
        x = dense(x, layer["w"], layer["b"])
        if li < n_layers - 1:
            x = jax.nn.relu(x)
    return x.astype(jnp.float32)
