"""Sparse-aggregation GNN-DQN for large interference graphs.

The dense model (models/gnn_dqn.py) carries an [N, N] adjacency — exact
reference semantics, fine to a few hundred nodes. This variant swaps the
dense contraction for sparse neighborhood aggregation over COO/blocked edges
(ops.spmm: segment-sum oracle or the Pallas blocked kernel), with
shared-per-node weights (ModelConfig.share_weights=True), scaling the same
3-round architecture to the synthetic 100k-node configs (BASELINE 4-5).

The aggregate is injected as a closure so the same forward serves:
  * aggregate_coo(graph)              — segment-sum (oracle / small graphs)
  * aggregate_blocked(fwd, bwd)       — Pallas one-hot kernel, incl.
                                        two-level layouts (large tables)
  * aggregate_windowed(fwd, bwd)      — zero-gather dense-window matmuls
                                        (BFS-ordered geometric graphs)
  * aggregate_fixed_degree(fd)        — sampled unbiased estimator
                                        (config 4; blocked backward via
                                        ops.spmm.make_spmm_sampled)
  * make_ring_spmm_gspmd(mesh, part)  — multi-chip halo-exchange ring
  * default_aggregate(graph)          — measured-policy picker
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


def aggregate_windowed(fwd_wd, bwd_wd, impl: str = "pallas") -> AggregateFn:
    """Windowed-dense aggregation (`graph.window_dense` layouts over a
    BFS-reordered geometric graph): zero gathers, ~95% of measured HBM
    streaming ceiling (docs/RESULTS.md)."""
    call = spmm_lib.make_spmm_windowed_call(impl=impl)
    return lambda h: call(h, fwd_wd, bwd_wd).astype(h.dtype)


def default_aggregate(graph: COOGraph, dtype=jnp.bfloat16,
                      impl: str = "pallas"):
    """Pick the measured-fastest aggregation for a topology
    (docs/RESULTS.md, round-3 tables) and build it.

    Returns (aggregate_fn, perm | None) — when the choice involves a BFS
    relabeling, node features must be permuted with `h_new = h_old[perm]`
    and outputs mapped back via `graph.inverse_permutation(perm)`.

    Policy:
      * graphs whose BFS sender windows are narrow (geometric/community
        structure) AND whose dense-window tiles fit a memory budget ->
        windowed-dense kernel (2.5-4x the gather path);
      * otherwise -> blocked Pallas kernel, two-level when the feature
        table outgrows ~100 MB (the 10M-edge locality fix).
    """
    import numpy as np

    from gnnra_tpu import graph as graph_lib

    n = graph.num_nodes
    g_bfs, perm = graph_lib.reorder_nodes(graph, "bfs")
    receivers = np.asarray(g_bfs.receivers)
    senders = np.asarray(g_bfs.senders)
    r_block = 256          # measured optimum (docs/RESULTS.md sweep)
    num_blocks = max(1, -(-n // r_block))
    block_of = receivers // r_block
    mins = np.full(num_blocks, np.iinfo(np.int64).max)
    maxs = np.full(num_blocks, -1)
    np.minimum.at(mins, block_of, senders)
    np.maximum.at(maxs, block_of, senders)
    have = maxs >= 0
    span = int((maxs[have] - (mins[have] // 8) * 8 + 1).max(initial=1))
    window = max(128, -(-span // 128) * 128)
    a_bytes = n * window * jnp.dtype(dtype).itemsize
    if a_bytes <= 1 << 30:      # 1 GiB A-tile budget
        fwd_wd = graph_lib.window_dense(g_bfs, r_block, window, dtype)
        bwd_wd = graph_lib.window_dense(g_bfs.transpose(), r_block=r_block,
                                        dtype=dtype)
        return aggregate_windowed(fwd_wd, bwd_wd, impl), perm
    # fall back to the gather path on the ORIGINAL ordering (BFS buys the
    # gather nothing — measured, docs/RESULTS.md geometric table)
    table_bytes = n * 128 * 4
    if table_bytes > 100 * (1 << 20):
        fwd = graph_lib.block_two_level(graph, r_block=256)
        bwd = graph_lib.block_two_level(graph.transpose(), r_block=256)
    else:
        fwd = graph_lib.block_by_receiver(graph, r_block=256)
        bwd = graph_lib.block_by_receiver(graph.transpose(), r_block=256)
    return aggregate_blocked(fwd, bwd, impl), None


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
