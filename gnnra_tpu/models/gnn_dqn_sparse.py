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
    """Segment-sum aggregation closure (differentiable through JAX).
    Accumulates in f32 regardless of the model's compute dtype (`apply`
    passes h as-is; each aggregate owns its precision policy)."""
    return lambda h: spmm_lib.spmm_coo(h.astype(jnp.float32), graph)


def aggregate_fixed_degree(fd) -> AggregateFn:
    """Sampled-neighborhood aggregation (graph.FixedDegreeGraph from
    `graph.sample_neighbors`): unbiased estimator of the full aggregation,
    gather-only forward — the BASELINE config 4 sampling path. Resample per
    step (new key -> new fd) for fresh estimator noise."""
    return lambda h: spmm_lib.spmm_fixed_degree(h.astype(jnp.float32), fd)


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
    return lambda h: call(h.astype(jnp.float32), fwd_layout, bwd_layout)


def aggregate_windowed_t(fwd_wdt, bwd_wdt,
                         impl: str = "pallas") -> AggregateFn:
    """Feature-major windowed aggregation (`graph.window_dense_t` layouts)
    for NARROW feature dims: the node-major kernel's window DMAs are
    lane-padded to 128, so at the model's own F=16 they move 8x real
    data; the feature-major kernel's windows are all real data and win
    at every measured scale (round-5 narrow-F table, docs/RESULTS.md:
    int8 F=16 5.07 vs 3.74 Gedges/s at 100k, 3.44 vs 1.44 at 500k,
    1.65 vs 0.76 at 1M)."""
    call = spmm_lib.make_spmm_windowed_t_call(impl=impl,
                                              out_dtype="input")
    return lambda h: call(h, fwd_wdt, bwd_wdt)


def aggregate_windowed(fwd_wd, bwd_wd, impl: str = "pallas") -> AggregateFn:
    """Windowed-dense aggregation (`graph.window_dense` layouts over a
    BFS-reordered geometric graph): zero gathers; measured at 90% of the
    platform's pure-read HBM ceiling in int8 / ~94% of the copy ceiling in
    bf16 (per-kernel roofline table, docs/RESULTS.md round 4). The kernel
    emits h's own dtype directly (out_dtype="input") — the post-hoc f32
    cast cost a full [N, F] round trip."""
    call = spmm_lib.make_spmm_windowed_call(impl=impl, out_dtype="input")
    return lambda h: call(h, fwd_wd, bwd_wd)


#: Per-chip HBM of the target part (TPU v5e). The windowed layouts' A
#: tiles must coexist with feature tables, activations, and replay state,
#: so the policy lets the (forward + transposed-backward) A pair take at
#: most this fraction of it.
HBM_BYTES = 16 << 30
A_PAIR_HBM_FRACTION = 0.6


def choose_aggregate_policy(num_nodes: int, num_edges: int, window: int,
                            weights_are_small_integers: bool,
                            dtype=jnp.bfloat16, feature_dim: int = 128,
                            feature_bytes: int = 4,
                            hbm_bytes: int = HBM_BYTES):
    """Shape-level aggregation policy (no arrays touched): decide which
    measured-fastest kernel (docs/RESULTS.md round-3/4 tables) a graph with
    these statistics should use.

    Returns (kind, a_dtype) with kind in {"windowed", "windowed_t",
    "two_level", "blocked"}; a_dtype is the windowed A-tile storage dtype
    (None for the gather paths). "windowed_t" is the round-5 narrow-F
    feature-major layout: chosen whenever the windowed family wins AND
    feature_dim <= 32 — the node-major kernel lane-pads its window DMAs
    to 128 and measured identical times at F=16 and F=128, while the
    feature-major kernel wins at every measured scale (100k/500k/1M,
    docs/RESULTS.md round-5 narrow-F table).

    The windowed-dense kernel wins when its modeled HBM traffic undercuts
    the gather path's AND its A tiles (forward + transposed backward) fit
    the HBM budget:

      windowed bytes ~= N*W*itemsize(A) + ceil(N/R)*W*F*2 (bf16 windows)
                        + N*F*4 (f32 out)
      blocked  bytes ~= E * (F*fb gather + 2*F*fb msgs round trip)
                        + N*F*4

    (both models validated against measured rates in docs/RESULTS.md —
    the modeled 5.8x at 100k-node geometric maps to the measured 3.1x).
    int8 A tiles are tried first when the edge weights are small integers
    (halving the dominant A traffic; `graph.window_dense` re-validates the
    ACCUMULATED weights during the build) unless the caller explicitly
    requested float32 — an exact-arithmetic ask the int8/bf16 path cannot
    honor.
    """
    r_block = 256              # measured optimum (docs/RESULTS.md sweep)
    num_blocks = max(1, -(-num_nodes // r_block))
    out_bytes = num_nodes * feature_dim * 4
    # Costs are modeled in TIME, not bytes: the windowed family is
    # bandwidth-bound (measured 86-100% of the ~700 GB/s effective read
    # ceiling), but the gather path has a PER-EDGE floor the bytes model
    # misses — measured ~4 ns/edge at F=128 (0.25 Gedges/s) and WORSE at
    # F=16 (0.094 Gedges/s: per-row gather overhead amortizes over fewer
    # bytes). Round-5 narrow-F measurement; using the optimistic 4 ns
    # floor keeps the comparison conservative for the gather path.
    bw = 700e9
    gather_ns_per_edge = 4e-9
    blocked_bytes = (num_edges * feature_dim * feature_bytes * 3
                     + out_bytes)
    blocked_cost = max(blocked_bytes / bw,
                       num_edges * gather_ns_per_edge)
    budget = int(hbm_bytes * A_PAIR_HBM_FRACTION)
    candidates = []
    if weights_are_small_integers and jnp.dtype(dtype) != jnp.float32:
        candidates.append(jnp.int8)
    candidates.append(dtype)
    narrow_f = feature_dim <= 32
    for dt in candidates:
        # the feature-major layout's 128-aligned starts widen W by at
        # most 128 rows; its windows move real-F bytes instead of
        # 128-lane-padded ones
        w_eff = window + 128 if narrow_f else window
        f_eff = feature_dim if narrow_f else max(128, feature_dim)
        a_bytes = num_nodes * w_eff * jnp.dtype(dt).itemsize
        win_bytes = (a_bytes + num_blocks * w_eff * f_eff * 2
                     + out_bytes)
        if 2 * a_bytes <= budget and win_bytes / bw <= blocked_cost:
            return ("windowed_t" if narrow_f else "windowed"), dt
    table_bytes = num_nodes * feature_dim * feature_bytes
    if table_bytes > 100 * (1 << 20):
        return "two_level", None
    return "blocked", None


def bfs_window_stats(graph: COOGraph, r_block: int = 256):
    """BFS-relabel a graph and measure its receiver-block sender windows.

    Returns (g_bfs, perm, window) where window is the tightest multiple of
    128 covering the widest block's 8-aligned sender span — the input the
    policy (and `graph.window_dense`) needs.
    """
    import numpy as np

    from gnnra_tpu import graph as graph_lib

    n = graph.num_nodes
    g_bfs, perm = graph_lib.reorder_nodes(graph, "bfs")
    receivers = np.asarray(g_bfs.receivers)
    senders = np.asarray(g_bfs.senders)
    num_blocks = max(1, -(-n // r_block))
    block_of = receivers // r_block
    mins = np.full(num_blocks, np.iinfo(np.int64).max)
    maxs = np.full(num_blocks, -1)
    np.minimum.at(mins, block_of, senders)
    np.maximum.at(maxs, block_of, senders)
    have = maxs >= 0
    span = int((maxs[have] - (mins[have] // 8) * 8 + 1).max(initial=1))
    return g_bfs, perm, max(128, -(-span // 128) * 128)


def default_aggregate(graph: COOGraph, dtype=jnp.bfloat16,
                      impl: str = "pallas", feature_dim: int = 128,
                      feature_bytes: int = 4,
                      hbm_bytes: int = HBM_BYTES):
    """Pick the measured-fastest aggregation for a topology
    (docs/RESULTS.md tables; decision logic in `choose_aggregate_policy`)
    and build it.

    Returns (aggregate_fn, perm | None) — when the choice involves a BFS
    relabeling, node features must be permuted with `h_new = h_old[perm]`
    and outputs mapped back via `graph.inverse_permutation(perm)`.

    feature_dim/feature_bytes describe the model's aggregated feature
    rows (defaults match the scaled-config benches); they size both the
    modeled-traffic comparison and the gather path's two-level cutover.
    """
    import numpy as np

    from gnnra_tpu import graph as graph_lib

    r_block = 256
    g_bfs, perm, window = bfs_window_stats(graph, r_block)
    w_np = np.asarray(graph.weights)
    ints = bool(np.all(w_np == np.round(w_np))
                and np.abs(w_np).max(initial=0) <= 127)
    kind, a_dtype = choose_aggregate_policy(
        graph.num_nodes, graph.num_edges, window, ints, dtype=dtype,
        feature_dim=feature_dim, feature_bytes=feature_bytes,
        hbm_bytes=hbm_bytes)
    while kind in ("windowed", "windowed_t"):
        try:
            if kind == "windowed_t":
                fwd_wdt = graph_lib.window_dense_t(g_bfs, r_block,
                                                   dtype=a_dtype)
                bwd_wdt = graph_lib.window_dense_t(g_bfs.transpose(),
                                                   r_block=r_block,
                                                   dtype=a_dtype)
                return aggregate_windowed_t(fwd_wdt, bwd_wdt, impl), perm
            # UNIFORM windows by default: the variable-width bucketed
            # layout wins +10% at the isolated-kernel level (3.90 vs 3.57
            # Gedges/s fwd int8) but measured 8% SLOWER in the composed
            # training step (219.6 vs 239.5 steps/s at 100k nodes,
            # benchmarks/sparse_train_bench.py --bucketed) — build
            # bucketed layouts explicitly for fwd-dominated inference or
            # when the A-memory cut (0.80x) is needed at config-5 scale.
            fwd_wd = graph_lib.window_dense(g_bfs, r_block, window,
                                            a_dtype)
            bwd_wd = graph_lib.window_dense(g_bfs.transpose(),
                                            r_block=r_block, dtype=a_dtype)
            return aggregate_windowed(fwd_wd, bwd_wd, impl), perm
        except ValueError:
            # int8 pre-check passed but ACCUMULATED duplicate-edge weights
            # overflowed during the build — retry without int8 eligibility
            if jnp.dtype(a_dtype) != jnp.int8:
                raise
            kind, a_dtype = choose_aggregate_policy(
                graph.num_nodes, graph.num_edges, window, False,
                dtype=dtype, feature_dim=feature_dim,
                feature_bytes=feature_bytes, hbm_bytes=hbm_bytes)
    # gather path on the ORIGINAL ordering (BFS buys the gather nothing —
    # measured, docs/RESULTS.md geometric table)
    table_bytes = graph.num_nodes * feature_dim * feature_bytes
    if kind == "two_level":
        assert table_bytes > 100 * (1 << 20)
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
        # h passes in the model's compute dtype; each aggregate closure
        # owns its own precision policy (the windowed kernel computes in
        # the layout dtype and emits compute_dtype directly — round-4
        # change removing a full f32 [N, F] HBM round trip per round)
        nbr = aggregate(h).astype(compute_dtype)
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
