"""Sparse neighborhood aggregation: SpMM / SDDMM, jnp reference + Pallas.

The hot op of any scaled interference-GNN (BASELINE.json north star): for a
graph A (edges s -> r with weight w),

  SpMM:   out[r, :] = sum_{e: recv_e = r} w_e * h[send_e, :]
  SDDMM:  out[e] = <a[send_e, :], b[recv_e, :]>   (edge scores / weight grads)

TPU-native design (gnnra_tpu.graph.BlockedGraph): edges are grouped by
receiver block (R_BLOCK rows) and padded to a uniform per-block budget; the
segment reduction for a block is then

  out_block = (w * onehot(recv_local))^T @ msgs          [R_BLOCK, F]

— a dense matmul on the MXU with the one-hot indicator built in-registers
from an iota compare (never touching HBM). The Pallas kernel fuses edge
weighting + indicator construction + reduction; XLA performs the row gather
`h[senders]` (its native gather is already bandwidth-bound for random rows).

The backward pass is the same SpMM on the transposed graph:
  dL/dh[s] = sum_{e: send_e = s} w_e * g[recv_e]
so `make_spmm` closes over (forward, transpose) blocked layouts and wires a
custom VJP; `aggregate_sparse` (plain segment-sum) remains the semantic
oracle, asserted in tests.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from gnnra_tpu.graph import (BlockedGraph, COOGraph,
                             TwoLevelBlockedGraph)

Impl = Literal["jnp", "pallas", "pallas_interpret"]


# ---------------------------------------------------------------------------
# Reference (oracle) implementations
# ---------------------------------------------------------------------------

def spmm_coo(h: jax.Array, graph: COOGraph) -> jax.Array:
    """Segment-sum SpMM oracle: out[r] = sum w_e * h[s_e]. Returns [N, F]."""
    msgs = h[graph.senders] * graph.weights[:, None]
    return jax.ops.segment_sum(msgs, graph.receivers,
                               num_segments=graph.num_nodes)


def sddmm_coo(a: jax.Array, b: jax.Array, graph: COOGraph) -> jax.Array:
    """SDDMM oracle: out[e] = <a[s_e], b[r_e]>. Returns [E]."""
    return jnp.sum(a[graph.senders] * b[graph.receivers], axis=-1)


# ---------------------------------------------------------------------------
# Blocked implementations (jnp fallback + Pallas kernel)
# ---------------------------------------------------------------------------

def _gather_msgs(h: jax.Array, blocked) -> jax.Array:
    """XLA row gather into slot order: [B, E_BLOCK, F].

    For the two-level layout the gather runs chunk-by-chunk: each chunk's
    indices address only a [chunk_size, F] static slice of h, so the gather
    engine's working set stays DRAM-page/TLB-local no matter how large the
    full table is (the config-5 locality fix, docs/RESULTS.md)."""
    if isinstance(blocked, TwoLevelBlockedGraph):
        s = blocked.chunk_size
        n = h.shape[0]
        parts = [h[c * s:min((c + 1) * s, n)][blocked.senders[c]]
                 for c in range(blocked.num_chunks)]     # [B, E_CELL, F] each
        return jnp.concatenate(parts, axis=1)            # [B, C*E_CELL, F]
    return h[blocked.senders]


def _spmm_blocked_jnp(h: jax.Array, blocked) -> jax.Array:
    """Pure-jnp blocked SpMM (same math as the kernel; used as oracle and as
    CPU fallback). Returns [num_nodes, F]."""
    msgs = _gather_msgs(h, blocked)                      # [B, E, F]
    r_ids = jnp.arange(blocked.r_block)
    onehot = (blocked.recv_local[:, :, None] == r_ids[None, None, :])
    m = onehot.astype(h.dtype) * blocked.weights[:, :, None].astype(h.dtype)
    out = jnp.einsum("ber,bef->brf", m, msgs,
                     preferred_element_type=jnp.float32,
                     precision=(jax.lax.Precision.HIGHEST
                                if h.dtype == jnp.float32 else None))
    return out.reshape(blocked.num_nodes_padded, -1)[:blocked.num_nodes]


def _seg_reduce_kernel(recv_ref, w_ref, msgs_ref, out_ref):
    """Per-receiver-block segment reduction on the MXU.

    recv_ref: [1, 1, E] int32, w_ref: [1, 1, E] f32, msgs_ref: [1, E, F],
    out_ref: [1, R, F]. (Per-edge vectors carry a dummy sublane axis so the
    block shape matches the TPU (sublane, lane) tiling rules.)
    """
    e = recv_ref.shape[-1]
    r = out_ref.shape[1]
    recv = recv_ref[0, 0, :]                             # [E]
    w = w_ref[0, 0, :]                                   # [E]
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (e, r), 1)
    onehot = (recv[:, None] == r_ids).astype(msgs_ref.dtype)
    m = onehot * w[:, None].astype(msgs_ref.dtype)       # [E, R]
    # exact f32 accumulation for f32 inputs (free: the op is HBM-bound);
    # bf16 inputs use the MXU's native path with f32 accumulate
    precision = (jax.lax.Precision.HIGHEST
                 if msgs_ref.dtype == jnp.float32 else None)
    out = jax.lax.dot_general(
        m, msgs_ref[0, :, :],
        dimension_numbers=(((0,), (0,)), ((), ())),      # m^T @ msgs
        preferred_element_type=jnp.float32,
        precision=precision)
    out_ref[0, :, :] = out.astype(out_ref.dtype)


def _spmm_blocked_pallas(h: jax.Array, blocked,
                         interpret: bool = False) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    msgs = _gather_msgs(h, blocked)                      # [B, E, F]
    b, e = blocked.recv_local.shape
    f = h.shape[-1]
    r = blocked.r_block
    grid = (b,)
    flops = 2 * b * e * r * f
    out = pl.pallas_call(
        _seg_reduce_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, f), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r, f), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=msgs.size * 4 + b * r * f * 4,
            transcendentals=0),
        interpret=interpret,
    )(blocked.recv_local[:, None, :], blocked.weights[:, None, :], msgs)
    return out.reshape(blocked.num_nodes_padded, f)[:blocked.num_nodes]


def spmm_blocked(h: jax.Array, blocked,
                 impl: Impl = "pallas") -> jax.Array:
    """Non-differentiable blocked SpMM over a `BlockedGraph` OR a
    `TwoLevelBlockedGraph` (sender-chunked gather for very large node
    tables); see `make_spmm` for the VJP'd op."""
    if impl == "jnp":
        return _spmm_blocked_jnp(h, blocked)
    return _spmm_blocked_pallas(h, blocked,
                                interpret=(impl == "pallas_interpret"))


def make_spmm(fwd_blocked, bwd_blocked, impl: Impl = "pallas"):
    """Differentiable SpMM closed over (forward, transposed) blocked layouts
    (single-level `block_by_receiver` or two-level `block_two_level`).

    fwd_blocked: block_by_receiver(graph)
    bwd_blocked: block_by_receiver(graph.transpose()) — used for dL/dh.
    """

    @jax.custom_vjp
    def spmm(h):
        return spmm_blocked(h, fwd_blocked, impl)

    def fwd(h):
        return spmm(h), None

    def bwd(_, g):
        return (spmm_blocked(g, bwd_blocked, impl),)

    spmm.defvjp(fwd, bwd)
    return spmm


def make_spmm_call(impl: Impl = "pallas"):
    """Differentiable SpMM taking the layouts as ARGUMENTS:
    f(h, fwd_blocked, bwd_blocked) -> [N, F].

    `make_spmm` closes over the layout arrays, which jit embeds in the
    program as constants — at 10M-edge scale that is hundreds of MB of
    HLO, too large for remote-compile transports (observed: HTTP 413 from
    the compile relay). Passing the layouts as pytree arguments keeps the
    program small and the arrays as runtime parameters. The layout args
    get symbolic-zero cotangents (float0 for the int arrays)."""

    @jax.custom_vjp
    def f(h, fwd_blocked, bwd_blocked):
        del bwd_blocked
        return spmm_blocked(h, fwd_blocked, impl)

    def fwd(h, fwd_blocked, bwd_blocked):
        return (f(h, fwd_blocked, bwd_blocked),
                (h.shape[0], fwd_blocked, bwd_blocked))

    def _zero_cotangent(tree):
        import numpy as _np
        return jax.tree.map(
            lambda x: (jnp.zeros(x.shape, x.dtype)
                       if jnp.issubdtype(x.dtype, jnp.floating)
                       else _np.zeros(x.shape, jax.dtypes.float0)), tree)

    def bwd(res, g):
        n, fwd_blocked, bwd_blocked = res
        dh = spmm_blocked(g, bwd_blocked, impl)[:n]
        return dh, _zero_cotangent(fwd_blocked), _zero_cotangent(bwd_blocked)

    f.defvjp(fwd, bwd)
    return f


def make_weighted_spmm(fwd_blocked: BlockedGraph, bwd_blocked: BlockedGraph,
                       impl: Impl = "pallas"):
    """Differentiable SpMM in BOTH node features and per-edge weights.

    Returns f(h [N,F], w [E]) -> [N,F] where w lives in original COO edge-id
    order (graph.BlockedGraph.edge_ids maps layout slots back to it; padding
    slots read/write a sentinel slot E):

      out[r]   = sum_e w_e h[s_e]
      dL/dh[s] = sum_e w_e g[r_e]        (SpMM on the transposed layout)
      dL/dw_e  = <g[r_e], h[s_e]>        (SDDMM on the forward layout)

    This is the building block for attention-style / learned-edge-weight
    GNNs on top of the same blocked kernels.
    """
    e_orig = fwd_blocked.num_edges

    def _layout_weights(w, blocked):
        w_pad = jnp.concatenate([w, jnp.zeros((1,), w.dtype)])
        return w_pad[blocked.edge_ids]                  # [B, E_BLOCK]

    @jax.custom_vjp
    def f(h, w):
        bl = BlockedGraph(
            senders=fwd_blocked.senders, recv_local=fwd_blocked.recv_local,
            weights=_layout_weights(w, fwd_blocked),
            edge_ids=fwd_blocked.edge_ids, num_nodes=fwd_blocked.num_nodes,
            num_nodes_padded=fwd_blocked.num_nodes_padded,
            r_block=fwd_blocked.r_block, num_edges=e_orig)
        return spmm_blocked(h, bl, impl)

    def fwd(h, w):
        return f(h, w), (h, w)

    def bwd(res, g):
        h, w = res
        bl_t = BlockedGraph(
            senders=bwd_blocked.senders, recv_local=bwd_blocked.recv_local,
            weights=_layout_weights(w, bwd_blocked),
            edge_ids=bwd_blocked.edge_ids, num_nodes=bwd_blocked.num_nodes,
            num_nodes_padded=bwd_blocked.num_nodes_padded,
            r_block=bwd_blocked.r_block, num_edges=e_orig)
        dh = spmm_blocked(g, bl_t, impl)[:h.shape[0]]
        # dw via SDDMM on the forward layout: score[b, slot] = <h[s], g[r]>,
        # scattered back to original edge ids (padding-slot garbage lands in
        # the sentinel id E and is dropped)
        scores = sddmm_blocked(h, g, fwd_blocked, impl)
        dw = jnp.zeros((e_orig + 1,), w.dtype).at[
            fwd_blocked.edge_ids.reshape(-1)].add(scores.reshape(-1))
        return dh, dw[:e_orig]

    f.defvjp(fwd, bwd)
    return f


# ---------------------------------------------------------------------------
# Windowed-dense SpMM (geometric / BFS-ordered topologies, moderate N)
# ---------------------------------------------------------------------------

def _windowed_kernel(wstart_ref, a_ref, h_hbm, out_ref, h_win, sems):
    """One grid step = one receiver block: out_block = A_block @ h_window.

    A tiles stream through the auto-pipelined BlockSpec; the h window (whose
    start `wstart_ref[b]` is an arbitrary row, beyond BlockSpec's aligned
    indexing) is DMA'd manually with cross-step double buffering: step b
    issues the copy for block b+1's window into the other slot, then waits
    on its own. No gather exists anywhere — both operands are sequential
    reads, and the matmul is exactly MXU-shaped.

    a_ref: [R, W] (2-D A rows — 3-D (1, R, W) bf16 blocks stream ~5x
    slower, see WindowedDenseGraph); h_hbm: [N_pad, F] (ANY/HBM);
    out_ref: [R, F] f32;
    h_win: [2, W, F] VMEM scratch; sems: 2 DMA semaphores.
    """
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    w = h_win.shape[1]

    def dma(i):
        from jax.experimental.pallas import tpu as pltpu
        start = pl.multiple_of(wstart_ref[i], 8)   # host aligns starts to 8
        return pltpu.make_async_copy(
            h_hbm.at[pl.ds(start, w), :],
            h_win.at[jax.lax.rem(i, 2)],
            sems.at[jax.lax.rem(i, 2)])

    @pl.when(b == 0)
    def _():
        dma(0).start()

    @pl.when(b + 1 < nb)
    def _():
        dma(b + 1).start()

    dma(b).wait()
    a = a_ref[:]                                          # [R, W]
    h = h_win[jax.lax.rem(b, 2)]                          # [W, F]
    precision = (jax.lax.Precision.HIGHEST
                 if a.dtype == jnp.float32 else None)
    out = jax.lax.dot_general(
        a, h, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    # accumulation is f32 on the MXU regardless of out_ref's dtype; a bf16
    # out_ref only rounds the final store — numerically identical to
    # storing f32 and casting outside, minus a full [N, F] HBM round trip
    out_ref[:] = out.astype(out_ref.dtype)


def _pad_rows(h: jax.Array, rows: int) -> jax.Array:
    if h.shape[0] >= rows:
        return h
    return jnp.zeros((rows, h.shape[1]), h.dtype).at[:h.shape[0]].set(h)


def _spmm_windowed_pallas(h: jax.Array, wd, interpret: bool = False,
                          out_dtype=None) -> jax.Array:
    from jax.experimental.pallas import tpu as pltpu

    f_in = h.shape[-1]
    r = wd.r_block
    w = wd.window
    nb = wd.num_blocks
    compute_dtype = (jnp.bfloat16 if wd.a_dense.dtype == jnp.int8
                     else wd.a_dense.dtype)
    out_dtype = jnp.dtype(out_dtype or jnp.float32)
    h = h.astype(compute_dtype)
    # the manual window DMA slices [W, F] out of h: the minor dim must be
    # lane-aligned (Mosaic: "slice shape along dimension 1 must be aligned
    # to tiling (128)"), so narrow feature dims are padded up
    f = max(128, -(-f_in // 128) * 128)
    if f != f_in:
        h = jnp.concatenate(
            [h, jnp.zeros((h.shape[0], f - f_in), h.dtype)], axis=-1)
    h_pad = _pad_rows(h, max(wd.num_nodes_padded, w))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((r, w), lambda b, ws: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((r, f), lambda b, ws: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, w, f), h.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _windowed_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((wd.num_nodes_padded, f), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * r * w * f,
            bytes_accessed=(wd.a_dense.size * wd.a_dense.dtype.itemsize
                            + nb * w * f * h.dtype.itemsize
                            + wd.num_nodes_padded * f * out_dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(wd.w_start, wd.a_dense, h_pad)
    return out[:wd.num_nodes, :f_in]


def _spmm_windowed_jnp(h: jax.Array, wd, out_dtype=None) -> jax.Array:
    """Vectorized jnp oracle/fallback (same math as the kernel)."""
    f = h.shape[-1]
    w = wd.window
    compute_dtype = (jnp.bfloat16 if wd.a_dense.dtype == jnp.int8
                     else wd.a_dense.dtype)
    h_pad = _pad_rows(h.astype(compute_dtype),
                      max(wd.num_nodes_padded, w))
    idx = wd.w_start[:, None] + jnp.arange(w)[None, :]    # [B, W]
    h_win = h_pad[idx]                                    # [B, W, F]
    a3 = wd.a_dense.reshape(wd.num_blocks, wd.r_block, w
                            ).astype(compute_dtype)
    out = jnp.einsum("brw,bwf->brf", a3, h_win,
                     preferred_element_type=jnp.float32,
                     precision=(jax.lax.Precision.HIGHEST
                                if compute_dtype == jnp.float32 else None))
    return out.reshape(-1, f)[:wd.num_nodes].astype(out_dtype or jnp.float32)


def _windowed_t_kernel(wstart_ref, a_ref, ht_hbm, out_ref, h_win, sems):
    """Feature-major windowed SpMM, one grid step = one receiver block:
    out_block [F, R] = h_window [F, W] @ A_t [W, R].

    For narrow F the node-major kernel's [W, F] window DMA is lane-padded
    to 128 (8x waste at F=16); here the window slices the LANE axis of
    the [F_pad, N_pad] feature table — all real data — with the same
    cross-step double buffering. a_ref: [W, R] transposed tile;
    ht_hbm: [F_pad, N_lane_pad] (ANY/HBM); out_ref: [F_pad, R];
    h_win: [2, F_pad, W] VMEM scratch; sems: 2 DMA semaphores.
    """
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    w = h_win.shape[2]

    def dma(i):
        from jax.experimental.pallas import tpu as pltpu
        start = pl.multiple_of(wstart_ref[i], 128)  # host aligns to lanes
        return pltpu.make_async_copy(
            ht_hbm.at[:, pl.ds(start, w)],
            h_win.at[jax.lax.rem(i, 2)],
            sems.at[jax.lax.rem(i, 2)])

    @pl.when(b == 0)
    def _():
        dma(0).start()

    @pl.when(b + 1 < nb)
    def _():
        dma(b + 1).start()

    dma(b).wait()
    a = a_ref[:]                                          # [W, R]
    h = h_win[jax.lax.rem(b, 2)]                          # [F, W]
    if a.dtype != h.dtype:
        a = a.astype(h.dtype)                             # int8 tiles
    precision = (jax.lax.Precision.HIGHEST
                 if h.dtype == jnp.float32 else None)
    out = jax.lax.dot_general(
        h, a, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    out_ref[:] = out.astype(out_ref.dtype)


def _spmm_windowed_t_pallas(h: jax.Array, wdt, interpret: bool = False,
                            out_dtype=None) -> jax.Array:
    from jax.experimental.pallas import tpu as pltpu

    f_in = h.shape[-1]
    r = wdt.r_block
    w = wdt.window
    nb = wdt.num_blocks
    compute_dtype = (jnp.bfloat16 if wdt.a_dense_t.dtype == jnp.int8
                     else wdt.a_dense_t.dtype)
    out_dtype = jnp.dtype(out_dtype or jnp.float32)
    h = h.astype(compute_dtype)
    # feature-major table: F padded to the sublane tile, node axis (now
    # the lane axis) padded to a 128 multiple covering every window.
    # h may have MORE rows than the output (banded halo exchange passes
    # a sender band wider than the block rows) — cover those too.
    f = max(8, -(-f_in // 8) * 8)
    n_lane_pad = -(-max(wdt.num_nodes_padded, w, h.shape[0]) // 128) * 128
    ht = jnp.zeros((f, n_lane_pad), h.dtype)
    ht = ht.at[:f_in, :h.shape[0]].set(h.T)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((w, r), lambda b, ws: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((f, r), lambda b, ws: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, f, w), h.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_t = pl.pallas_call(
        _windowed_t_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f, nb * r), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * r * w * f,
            bytes_accessed=(wdt.a_dense_t.size
                            * wdt.a_dense_t.dtype.itemsize
                            + nb * w * f * h.dtype.itemsize
                            + nb * r * f * out_dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(wdt.w_start, wdt.a_dense_t, ht)
    return out_t[:f_in, :wdt.num_nodes].T


def _spmm_windowed_t_jnp(h: jax.Array, wdt, out_dtype=None) -> jax.Array:
    """Vectorized jnp oracle/fallback (same math as the kernel)."""
    f = h.shape[-1]
    w = wdt.window
    compute_dtype = (jnp.bfloat16 if wdt.a_dense_t.dtype == jnp.int8
                     else wdt.a_dense_t.dtype)
    n_lane_pad = -(-max(wdt.num_nodes_padded, w, h.shape[0]) // 128) * 128
    h_pad = _pad_rows(h.astype(compute_dtype), n_lane_pad)
    idx = wdt.w_start[:, None] + jnp.arange(w)[None, :]   # [B, W]
    h_win = h_pad[idx]                                    # [B, W, F]
    a3 = wdt.a_dense_t.reshape(wdt.num_blocks, w, wdt.r_block
                               ).astype(compute_dtype)
    out = jnp.einsum("bwr,bwf->brf", a3, h_win,
                     preferred_element_type=jnp.float32,
                     precision=(jax.lax.Precision.HIGHEST
                                if compute_dtype == jnp.float32 else None))
    return out.reshape(-1, f)[:wdt.num_nodes].astype(out_dtype
                                                     or jnp.float32)


def _make_bucketed_t_kernel(widths):
    """Feature-major twin of `_make_bucketed_kernel`: one grid step = one
    receiver block in natural order; the window DMA slices the LANE axis
    of the [F, N_lane_pad] table at per-class widths; the matmul is
    h_win [F, W_k] @ A_t [W_k, R]."""
    from jax.experimental.pallas import tpu as pltpu

    k_count = len(widths)

    def kernel(*refs):
        # refs: w_start, bucket_of, a_idx_0..K-1 (prefetched scalars),
        #       a_0..a_{K-1} (VMEM blocks), ht_hbm (ANY), out_ref,
        #       h_win [2, F, W_max], sems [2] (scratch)
        w_start_ref = refs[0]
        bucket_ref = refs[1]
        a_refs = refs[2 + k_count:2 + 2 * k_count]
        ht_hbm = refs[2 + 2 * k_count]
        out_ref = refs[3 + 2 * k_count]
        h_win = refs[4 + 2 * k_count]
        sems = refs[5 + 2 * k_count]
        b = pl.program_id(0)
        nb = pl.num_programs(0)

        for k in range(k_count):
            wk = widths[k]

            def dma(i, wk=wk):
                start = pl.multiple_of(w_start_ref[i], 128)
                slot = jax.lax.rem(i, 2)
                return pltpu.make_async_copy(
                    ht_hbm.at[:, pl.ds(start, wk)],
                    h_win.at[slot, :, pl.ds(0, wk)],
                    sems.at[slot])

            @pl.when((b == 0) & (bucket_ref[0] == k))
            def _():
                dma(0).start()

            @pl.when((b + 1 < nb) & (bucket_ref[b + 1] == k))
            def _():
                dma(b + 1).start()

            @pl.when(bucket_ref[b] == k)
            def _(k=k, wk=wk):
                dma(b).wait()
                a = a_refs[k][:]                        # [W_k, R]
                h = h_win[jax.lax.rem(b, 2), :, 0:wk]   # [F, W_k]
                if a.dtype != h.dtype:
                    a = a.astype(h.dtype)
                precision = (jax.lax.Precision.HIGHEST
                             if h.dtype == jnp.float32 else None)
                out = jax.lax.dot_general(
                    h, a, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)
                out_ref[:] = out.astype(out_ref.dtype)

    return kernel


def _spmm_windowed_bucketed_t_pallas(h: jax.Array, bwt,
                                     interpret: bool = False,
                                     out_dtype=None) -> jax.Array:
    from jax.experimental.pallas import tpu as pltpu

    f_in = h.shape[-1]
    r = bwt.r_block
    nb = bwt.num_blocks
    k_count = len(bwt.widths)
    compute_dtype = (jnp.bfloat16 if bwt.a_parts[0].dtype == jnp.int8
                     else bwt.a_parts[0].dtype)
    out_dtype = jnp.dtype(out_dtype or jnp.float32)
    h = h.astype(compute_dtype)
    f = max(8, -(-f_in // 8) * 8)
    n_lane_pad = -(-max(bwt.num_nodes_padded, max(bwt.widths),
                        h.shape[0]) // 128) * 128
    ht = jnp.zeros((f, n_lane_pad), h.dtype)
    ht = ht.at[:f_in, :h.shape[0]].set(h.T)

    def a_spec(k):
        wk = bwt.widths[k]
        return pl.BlockSpec(
            (wk, r),
            (lambda k: lambda i, ws, bo, *ai: (ai[k][i], 0))(k),
            memory_space=pltpu.VMEM)

    w_max = max(bwt.widths)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 + k_count,
        grid=(nb,),
        in_specs=[a_spec(k) for k in range(k_count)] +
                 [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((f, r), lambda i, ws, bo, *ai: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, f, w_max), h.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    a_bytes = sum(a.size * a.dtype.itemsize for a in bwt.a_parts)
    sizes = [int(b.shape[0]) for b in bwt.block_ids]
    win_bytes = sum(sizes[k] * bwt.widths[k] * f * h.dtype.itemsize
                    for k in range(k_count))
    out_t = pl.pallas_call(
        _make_bucketed_t_kernel(bwt.widths),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f, nb * r), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * sum(sizes[k] * r * bwt.widths[k] * f
                          for k in range(k_count)),
            bytes_accessed=(a_bytes + win_bytes
                            + nb * r * f * out_dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(bwt.w_start, bwt.bucket_of, *bwt.a_idx, *bwt.a_parts, ht)
    return out_t[:f_in, :bwt.num_nodes].T


def _spmm_windowed_bucketed_t_jnp(h: jax.Array, bwt,
                                  out_dtype=None) -> jax.Array:
    """Vectorized jnp oracle/fallback (same math, bucket by bucket)."""
    f = h.shape[-1]
    r = bwt.r_block
    compute_dtype = (jnp.bfloat16 if bwt.a_parts[0].dtype == jnp.int8
                     else bwt.a_parts[0].dtype)
    n_lane_pad = -(-max(bwt.num_nodes_padded, max(bwt.widths),
                        h.shape[0]) // 128) * 128
    h_pad = _pad_rows(h.astype(compute_dtype), n_lane_pad)
    nb = bwt.num_blocks
    out = jnp.zeros((nb, r, f), jnp.float32)
    for k, wk in enumerate(bwt.widths):
        members = bwt.block_ids[k]
        nk = int(members.shape[0])
        if nk == 0:
            continue
        a3 = bwt.a_parts[k][:nk * wk].reshape(nk, wk, r
                                              ).astype(compute_dtype)
        idx = bwt.w_start[members][:, None] + jnp.arange(wk)[None, :]
        h_win = h_pad[idx]                                # [nk, W_k, F]
        res = jnp.einsum("bwr,bwf->brf", a3, h_win,
                         preferred_element_type=jnp.float32,
                         precision=(jax.lax.Precision.HIGHEST
                                    if compute_dtype == jnp.float32
                                    else None))
        out = out.at[members].set(res)
    return out.reshape(-1, f)[:bwt.num_nodes].astype(out_dtype
                                                     or jnp.float32)


def spmm_windowed_t(h: jax.Array, wdt, impl: Impl = "pallas",
                    out_dtype=None) -> jax.Array:
    """SpMM over a `graph.WindowedDenseTGraph` or
    `graph.BucketedWindowedTGraph` (feature-major windows for narrow F —
    round-5 narrow-F path; see the layouts' docstrings).
    Semantics match `spmm_coo` on the same edges (reference aggregation:
    BS_brain.py:69-76). Input and output are node-major [N, F] like
    `spmm_windowed`; the transposes to/from the feature-major table are
    one [N, F] pass each (negligible next to the A-tile streaming)."""
    from gnnra_tpu.graph import BucketedWindowedTGraph

    if isinstance(wdt, BucketedWindowedTGraph):
        if impl == "jnp":
            return _spmm_windowed_bucketed_t_jnp(h, wdt, out_dtype)
        return _spmm_windowed_bucketed_t_pallas(
            h, wdt, interpret=(impl == "pallas_interpret"),
            out_dtype=out_dtype)
    if impl == "jnp":
        return _spmm_windowed_t_jnp(h, wdt, out_dtype)
    return _spmm_windowed_t_pallas(h, wdt,
                                   interpret=(impl == "pallas_interpret"),
                                   out_dtype=out_dtype)


def spmm_windowed(h: jax.Array, wd, impl: Impl = "pallas",
                  out_dtype=None) -> jax.Array:
    """SpMM over a `graph.WindowedDenseGraph`: one dense MXU matmul per
    receiver block against its BFS sender window — zero gathers, fully
    sequential HBM traffic. Returns [N, F] in `out_dtype` (default
    float32; accumulation is f32 either way, only the final store rounds).
    Training paths that immediately cast to bf16 should pass
    out_dtype=bfloat16 — it removes a full [N, F] f32 HBM round trip
    (write f32 + read f32 + write bf16 -> write bf16; ~25% of the int8
    kernel's modeled traffic at F=128, benchmarks/roofline_bench.py).

    Semantics match `spmm_coo` on the same edges (reference aggregation:
    BS_brain.py:69-76); inputs are computed in the layout's dtype (bf16
    default — see `graph.window_dense`). Accepts a uniform
    `WindowedDenseGraph` or a variable-width `BucketedWindowedGraph`
    (`graph.window_dense_bucketed` — cuts the W-proportional traffic to
    the bucketed widths' total).
    """
    from gnnra_tpu.graph import BucketedWindowedGraph

    if isinstance(wd, BucketedWindowedGraph):
        if impl == "jnp":
            return _spmm_windowed_bucketed_jnp(h, wd, out_dtype)
        return _spmm_windowed_bucketed_pallas(
            h, wd, interpret=(impl == "pallas_interpret"),
            out_dtype=out_dtype)
    if impl == "jnp":
        return _spmm_windowed_jnp(h, wd, out_dtype)
    return _spmm_windowed_pallas(h, wd,
                                 interpret=(impl == "pallas_interpret"),
                                 out_dtype=out_dtype)


def _make_bucketed_kernel(widths):
    """Kernel factory for the variable-width windowed SpMM: one grid step
    = one receiver block, blocks in NATURAL order (ascending window
    starts — keeps the h-window DMA stream sequential; the first
    bucket-major design lost ~25% of sustained bandwidth to out-of-order
    windows). The step's width class comes from the prefetched
    `bucket_of` vector; every bucket shares one double-buffered window
    scratch sized for the widest class, with per-class DMA widths."""
    from jax.experimental.pallas import tpu as pltpu

    k_count = len(widths)

    def kernel(*refs):
        # refs: w_start, bucket_of, a_idx_0..K-1 (prefetched scalars),
        #       a_0..a_{K-1} (VMEM blocks), h_hbm (ANY), out_ref,
        #       h_win [2, W_max, F], sems [2] (scratch)
        w_start_ref = refs[0]
        bucket_ref = refs[1]
        a_refs = refs[2 + k_count:2 + 2 * k_count]
        h_hbm = refs[2 + 2 * k_count]
        out_ref = refs[3 + 2 * k_count]
        h_win = refs[4 + 2 * k_count]
        sems = refs[5 + 2 * k_count]
        b = pl.program_id(0)
        nb = pl.num_programs(0)

        for k in range(k_count):
            wk = widths[k]

            def dma(i, wk=wk):
                start = pl.multiple_of(w_start_ref[i], 8)
                slot = jax.lax.rem(i, 2)
                return pltpu.make_async_copy(
                    h_hbm.at[pl.ds(start, wk), :],
                    h_win.at[slot, pl.ds(0, wk), :],
                    sems.at[slot])

            @pl.when((b == 0) & (bucket_ref[0] == k))
            def _():
                dma(0).start()

            @pl.when((b + 1 < nb) & (bucket_ref[b + 1] == k))
            def _():
                dma(b + 1).start()

            @pl.when(bucket_ref[b] == k)
            def _(k=k, wk=wk):
                dma(b).wait()
                a = a_refs[k][:]                      # [R, W_k]
                h = h_win[jax.lax.rem(b, 2), 0:wk, :]  # [W_k, F]
                precision = (jax.lax.Precision.HIGHEST
                             if a.dtype == jnp.float32 else None)
                out = jax.lax.dot_general(
                    a, h, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)
                out_ref[:] = out.astype(out_ref.dtype)

    return kernel


def _spmm_windowed_bucketed_pallas(h: jax.Array, bwg,
                                   interpret: bool = False,
                                   out_dtype=None) -> jax.Array:
    from jax.experimental.pallas import tpu as pltpu

    f_in = h.shape[-1]
    r = bwg.r_block
    nb = bwg.num_blocks
    k_count = len(bwg.widths)
    compute_dtype = (jnp.bfloat16 if bwg.a_parts[0].dtype == jnp.int8
                     else bwg.a_parts[0].dtype)
    out_dtype = jnp.dtype(out_dtype or jnp.float32)
    h = h.astype(compute_dtype)
    f = max(128, -(-f_in // 128) * 128)
    if f != f_in:
        h = jnp.concatenate(
            [h, jnp.zeros((h.shape[0], f - f_in), h.dtype)], axis=-1)
    h_pad = _pad_rows(h, max(bwg.num_nodes_padded, max(bwg.widths)))

    def a_spec(k):
        wk = bwg.widths[k]
        return pl.BlockSpec(
            (r, wk),
            (lambda k: lambda i, ws, bo, *ai: (ai[k][i], 0))(k),
            memory_space=pltpu.VMEM)

    w_max = max(bwg.widths)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 + k_count,
        grid=(nb,),
        in_specs=[a_spec(k) for k in range(k_count)] +
                 [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((r, f), lambda i, ws, bo, *ai: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, w_max, f), h.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    a_bytes = sum(a.size * a.dtype.itemsize for a in bwg.a_parts)
    sizes = [int(b.shape[0]) for b in bwg.block_ids]
    win_bytes = sum(sizes[k] * bwg.widths[k] * f * h.dtype.itemsize
                    for k in range(k_count))
    out = pl.pallas_call(
        _make_bucketed_kernel(bwg.widths),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bwg.num_nodes_padded, f),
                                       out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * sum(sizes[k] * r * bwg.widths[k] * f
                          for k in range(k_count)),
            bytes_accessed=(a_bytes + win_bytes
                            + bwg.num_nodes_padded * f
                            * out_dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(bwg.w_start, bwg.bucket_of, *bwg.a_idx, *bwg.a_parts, h_pad)
    return out[:bwg.num_nodes, :f_in]


def _spmm_windowed_bucketed_jnp(h: jax.Array, bwg,
                                out_dtype=None) -> jax.Array:
    """Vectorized jnp oracle/fallback (same math, bucket by bucket)."""
    f = h.shape[-1]
    r = bwg.r_block
    compute_dtype = (jnp.bfloat16 if bwg.a_parts[0].dtype == jnp.int8
                     else bwg.a_parts[0].dtype)
    h_pad = _pad_rows(h.astype(compute_dtype),
                      max(bwg.num_nodes_padded, max(bwg.widths)))
    nb = bwg.num_blocks
    out = jnp.zeros((nb, r, f), jnp.float32)
    for k, wk in enumerate(bwg.widths):
        members = bwg.block_ids[k]                        # [nk] block ids
        nk = int(members.shape[0])
        if nk == 0:
            continue
        a3 = bwg.a_parts[k][:nk * r].reshape(nk, r, wk).astype(compute_dtype)
        idx = bwg.w_start[members][:, None] + jnp.arange(wk)[None, :]
        h_win = h_pad[idx]                                # [nk, W_k, F]
        res = jnp.einsum("brw,bwf->brf", a3, h_win,
                         preferred_element_type=jnp.float32,
                         precision=(jax.lax.Precision.HIGHEST
                                    if compute_dtype == jnp.float32
                                    else None))
        out = out.at[members].set(res)
    return out.reshape(-1, f)[:bwg.num_nodes].astype(
        out_dtype or jnp.float32)


def make_spmm_windowed(fwd_wd, bwd_wd, impl: Impl = "pallas"):
    """Differentiable windowed-dense SpMM closed over (forward, transposed)
    layouts; the backward runs the same kernel on the transposed graph
    (whose windows are equally narrow under a BFS order — the edge set is
    symmetric in ordering distance)."""

    @jax.custom_vjp
    def spmm(h):
        return spmm_windowed(h, fwd_wd, impl)

    def fwd(h):
        # residual = zero-size token carrying h's dtype (the cotangent must
        # match it; a bare dtype is not a valid JAX residual)
        return spmm(h), jnp.zeros((0,), h.dtype)

    def bwd(tok, g):
        return (spmm_windowed(g, bwd_wd, impl, out_dtype=tok.dtype),)

    spmm.defvjp(fwd, bwd)
    return spmm


def make_spmm_windowed_call(impl: Impl = "pallas", out_dtype=None):
    """Differentiable windowed-dense SpMM taking the layouts as ARGUMENTS:
    f(h, fwd_wd, bwd_wd) -> [N, F]. Like `make_spmm_call`, this keeps
    the multi-100MB A tiles out of the HLO constant pool (closing over them
    exceeds remote-compile transport limits — observed HTTP 413).

    out_dtype: None -> f32 output (back-compat); "input" -> emit h's own
    dtype straight from the kernel (training paths: saves the f32 [N, F]
    round trip the post-hoc cast costs); or an explicit dtype."""

    def _out(h):
        return h.dtype if out_dtype == "input" else out_dtype

    @jax.custom_vjp
    def f(h, fwd_wd, bwd_wd):
        del bwd_wd
        return spmm_windowed(h, fwd_wd, impl, out_dtype=_out(h))

    def fwd(h, fwd_wd, bwd_wd):
        return f(h, fwd_wd, bwd_wd), (jnp.zeros((0,), h.dtype), fwd_wd,
                                      bwd_wd)

    def _zeros_like_tree(tree):
        import numpy as _np
        return jax.tree.map(
            lambda x: (jnp.zeros(x.shape, x.dtype)
                       if jnp.issubdtype(x.dtype, jnp.floating)
                       else _np.zeros(x.shape, jax.dtypes.float0)), tree)

    def bwd(res, g):
        tok, fwd_wd, bwd_wd = res
        dh = spmm_windowed(g, bwd_wd, impl, out_dtype=tok.dtype)
        return dh, _zeros_like_tree(fwd_wd), _zeros_like_tree(bwd_wd)

    f.defvjp(fwd, bwd)
    return f


def make_spmm_windowed_t_call(impl: Impl = "pallas", out_dtype=None):
    """Differentiable feature-major windowed SpMM taking the layouts as
    ARGUMENTS: f(h, fwd_wdt, bwd_wdt) -> [N, F]. The backward is the same
    kernel on the transposed-graph layout (`graph.window_dense_t` of
    graph.transpose()). See `make_spmm_windowed_call` for the
    layouts-as-arguments rationale and the out_dtype contract."""

    def _out(h):
        return h.dtype if out_dtype == "input" else out_dtype

    @jax.custom_vjp
    def f(h, fwd_wdt, bwd_wdt):
        del bwd_wdt
        return spmm_windowed_t(h, fwd_wdt, impl, out_dtype=_out(h))

    def fwd(h, fwd_wdt, bwd_wdt):
        return f(h, fwd_wdt, bwd_wdt), (jnp.zeros((0,), h.dtype), fwd_wdt,
                                        bwd_wdt)

    def _zeros_like_tree(tree):
        import numpy as _np
        return jax.tree.map(
            lambda x: (jnp.zeros(x.shape, x.dtype)
                       if jnp.issubdtype(x.dtype, jnp.floating)
                       else _np.zeros(x.shape, jax.dtypes.float0)), tree)

    def bwd(res, g):
        tok, fwd_wdt, bwd_wdt = res
        dh = spmm_windowed_t(g, bwd_wdt, impl, out_dtype=tok.dtype)
        return dh, _zeros_like_tree(fwd_wdt), _zeros_like_tree(bwd_wdt)

    f.defvjp(fwd, bwd)
    return f


def _sddmm_windowed_kernel(wstart_ref, g_ref, h_hbm, out_ref, h_win, sems):
    """One grid step = one receiver block: out_block = g_block @ h_window^T.

    The dense windowed SDDMM — the exact gradient-of-A counterpart of
    `_windowed_kernel`: dL/dA[r, c] = <g[row r], h[w_start + c]>. Same
    zero-gather structure (A's sparsity is applied afterwards by gathering
    the edge slots out of this dense [R, W] result), same double-buffered
    manual window DMA, and the matmul is again exactly MXU-shaped.

    g_ref: [R, F]; h_hbm: [N_pad, F] (ANY/HBM); out_ref: [R, W] f32;
    h_win: [2, W, F] VMEM scratch; sems: 2 DMA semaphores.
    """
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    w = h_win.shape[1]

    def dma(i):
        from jax.experimental.pallas import tpu as pltpu
        start = pl.multiple_of(wstart_ref[i], 8)
        return pltpu.make_async_copy(
            h_hbm.at[pl.ds(start, w), :],
            h_win.at[jax.lax.rem(i, 2)],
            sems.at[jax.lax.rem(i, 2)])

    @pl.when(b == 0)
    def _():
        dma(0).start()

    @pl.when(b + 1 < nb)
    def _():
        dma(b + 1).start()

    dma(b).wait()
    g = g_ref[:]                                          # [R, F]
    h = h_win[jax.lax.rem(b, 2)]                          # [W, F]
    precision = (jax.lax.Precision.HIGHEST
                 if g.dtype == jnp.float32 else None)
    out_ref[:] = jax.lax.dot_general(
        g, h, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def sddmm_windowed_dense(g: jax.Array, h: jax.Array, wd,
                         impl: Impl = "pallas") -> jax.Array:
    """Dense windowed SDDMM: D[row, c] = <g[row], h[w_start[block]+c]> for
    every dense A slot of a `graph.WindowedDenseGraph`. Returns
    [B*R_BLOCK, W] f32; per-edge scores are `D[rows, cols]` with the maps
    from `graph.window_edge_slots`.

    This is `sddmm_coo` restricted to the layout's window structure,
    computed as one MXU matmul per block with zero gathers — the windowed
    analog of `sddmm_blocked` (reference edge-score semantics anchor:
    the dense batch_dot aggregation BS_brain.py:69-76 whose weight grads
    these are).
    """
    from jax.experimental.pallas import tpu as pltpu

    f_in = g.shape[-1]
    r = wd.r_block
    w = wd.window
    nb = wd.num_blocks
    compute_dtype = (jnp.bfloat16 if wd.a_dense.dtype == jnp.int8
                     else wd.a_dense.dtype)
    g = g.astype(compute_dtype)
    h = h.astype(compute_dtype)

    if impl == "jnp":
        h_pad = _pad_rows(h, max(wd.num_nodes_padded, w))
        idx = wd.w_start[:, None] + jnp.arange(w)[None, :]
        h_win = h_pad[idx]                                # [B, W, F]
        g3 = _pad_rows(g, wd.num_nodes_padded).reshape(nb, r, f_in)
        out = jnp.einsum("brf,bwf->brw", g3, h_win,
                         preferred_element_type=jnp.float32,
                         precision=(jax.lax.Precision.HIGHEST
                                    if compute_dtype == jnp.float32
                                    else None))
        return out.reshape(nb * r, w)

    # manual window DMA needs a lane-aligned minor dim (see
    # _spmm_windowed_pallas); pad narrow feature dims up to 128
    f = max(128, -(-f_in // 128) * 128)
    if f != f_in:
        pad = jnp.zeros((g.shape[0], f - f_in), compute_dtype)
        g = jnp.concatenate([g, pad], axis=-1)
        h = jnp.concatenate([h, jnp.zeros((h.shape[0], f - f_in),
                                          compute_dtype)], axis=-1)
    g_pad = _pad_rows(g, wd.num_nodes_padded)
    h_pad = _pad_rows(h, max(wd.num_nodes_padded, w))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((r, f), lambda b, ws: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((r, w), lambda b, ws: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, w, f), h_pad.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _sddmm_windowed_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * r, w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * r * w * f,
            bytes_accessed=(nb * (r + w) * f * h_pad.dtype.itemsize
                            + nb * r * w * 4),
            transcendentals=0),
        interpret=(impl == "pallas_interpret"),
    )(wd.w_start, g_pad, h_pad)


def make_weighted_spmm_windowed(fwd_wd, fwd_slots, bwd_wd, bwd_slots,
                                impl: Impl = "pallas"):
    """Differentiable windowed SpMM in BOTH node features and per-edge
    weights — the learned-edge-weight (attention-style) path on the FAST
    layout (round-3 gap: weighted/SDDMM support existed only on the slow
    single-level `BlockedGraph`).

    Returns f(h [N, F], w [E]) -> [N, F] f32 with w in original COO edge
    order:

      out[r]   = sum_e w_e h[s_e]       (dense-window MXU matmul; the A
                                         tiles are rebuilt from w by a
                                         1-scalar-per-edge scatter-add)
      dL/dh[s] = sum_e w_e g[r_e]       (same kernel, transposed layout)
      dL/dw_e  = <g[r_e], h[s_e]>       (dense windowed SDDMM + a
                                         1-scalar-per-edge gather)

    fwd_wd/bwd_wd: `graph.window_dense` layouts of the graph and its
    transpose (their stored a_dense supplies dtype/shape only — float32 or
    bfloat16; int8 tiles cannot hold learned weights and raise).
    fwd_slots/bwd_slots: `graph.window_edge_slots` maps for each layout.
    Duplicate edges accumulate into a shared A slot in the forward and
    read the shared slot's score in the backward — both exact, since the
    output is linear in each w_e through the accumulated cell.
    """
    from gnnra_tpu.graph import WindowedDenseGraph

    if jnp.dtype(fwd_wd.a_dense.dtype) == jnp.int8 or \
            jnp.dtype(bwd_wd.a_dense.dtype) == jnp.int8:
        raise ValueError("learned edge weights need float A tiles; build "
                         "the layouts with dtype=bfloat16 or float32")

    def _build(wd, slots, w):
        rows, cols = slots
        a = jnp.zeros(wd.a_dense.shape, jnp.float32
                      ).at[rows, cols].add(w.astype(jnp.float32))
        return WindowedDenseGraph(
            a_dense=a.astype(wd.a_dense.dtype), w_start=wd.w_start,
            num_nodes=wd.num_nodes, num_nodes_padded=wd.num_nodes_padded,
            r_block=wd.r_block, num_edges=wd.num_edges)

    @jax.custom_vjp
    def f(h, w):
        return spmm_windowed(h, _build(fwd_wd, fwd_slots, w), impl)

    def fwd(h, w):
        return f(h, w), (h, w)

    def bwd(res, g):
        h, w = res
        dh = spmm_windowed(g, _build(bwd_wd, bwd_slots, w), impl
                           )[:h.shape[0]].astype(h.dtype)
        rows, cols = fwd_slots
        scores = sddmm_windowed_dense(g, h, fwd_wd, impl)
        dw = scores[rows, cols].astype(w.dtype)
        return dh, dw

    f.defvjp(fwd, bwd)
    return f


# ---------------------------------------------------------------------------
# Fixed-degree (sampled-neighborhood) SpMM — BASELINE config 4 sampling path
# ---------------------------------------------------------------------------

def spmm_fixed_degree(h: jax.Array, fd) -> jax.Array:
    """SpMM over a `graph.FixedDegreeGraph` (uniform-K sampled in-edges):

      out[r] = sum_k fd.weights[r, k] * h[fd.senders[r, k]]

    The fixed-degree layout removes segment ids entirely: one [N, K] row
    gather + a weighted K-reduction, both of which XLA fuses — no one-hot,
    no Pallas needed. With the d/K importance scaling from
    `graph.sample_neighbors` this is an unbiased estimator of the full
    `spmm_coo` aggregation (GraphSAGE-style; the reference's dense 4-node
    AggLayer BS_brain.py:69-76 is the K=N-1 special case). Differentiable
    in both h and fd.weights through native XLA VJPs.
    """
    msgs = h[fd.senders]                                 # [N, K, F]
    return jnp.einsum("nk,nkf->nf", fd.weights.astype(h.dtype), msgs,
                      preferred_element_type=jnp.float32).astype(h.dtype)


def make_spmm_sampled(bwd_blocked: BlockedGraph, impl: Impl = "pallas"):
    """Differentiable sampled SpMM with a BLOCKED backward:
    f(h, fd) -> [N, F], fd a fresh `graph.sample_neighbors` draw per call.

    `spmm_fixed_degree`'s native VJP scatter-adds [N, K] full feature rows
    (dL/dh[s] += w*g[r] per sampled slot) — an XLA scatter that made the
    sampled TRAINING path slower than not sampling (docs/RESULTS.md:
    0.054 vs 0.112 Gedges/s). Here the backward instead:

      1. accumulates the draw's sampled weights per ORIGINAL edge id with
         one 1-D scalar scatter (4 bytes/slot instead of 4F — fd.edge_ids
         maps sampled slots to COO edge ids through the CSR build), then
      2. runs the full graph's blocked-TRANSPOSE Pallas kernel with those
         accumulated weights (`bwd_blocked.edge_ids` gathers them into
         layout slots; padding reads the zero sentinel).

    This is exact (multi-sampled edges accumulate), static-shape, and
    entirely on-device per draw. Cotangents for fd are zero — sampling
    weights are the fixed d/K importance scalings, not parameters.
    """
    e_orig = bwd_blocked.num_edges

    @jax.custom_vjp
    def f(h, fd):
        return spmm_fixed_degree(h, fd)

    def fwd(h, fd):
        return f(h, fd), (jnp.zeros((0,), h.dtype), fd)

    def bwd(res, g):
        tok, fd = res
        wsum = jnp.zeros((e_orig + 1,), jnp.float32).at[
            fd.edge_ids.reshape(-1)].add(fd.weights.reshape(-1))
        wsum = wsum.at[e_orig].set(0.0)           # degree-0/self sentinel
        bl = BlockedGraph(
            senders=bwd_blocked.senders, recv_local=bwd_blocked.recv_local,
            weights=wsum[bwd_blocked.edge_ids],
            edge_ids=bwd_blocked.edge_ids, num_nodes=bwd_blocked.num_nodes,
            num_nodes_padded=bwd_blocked.num_nodes_padded,
            r_block=bwd_blocked.r_block, num_edges=e_orig)
        dh = spmm_blocked(g.astype(tok.dtype), bl, impl)
        zero_fd = jax.tree.map(
            lambda x: (jnp.zeros(x.shape, x.dtype)
                       if jnp.issubdtype(x.dtype, jnp.floating)
                       else __import__("numpy").zeros(x.shape,
                                                      jax.dtypes.float0)), fd)
        return dh.astype(tok.dtype), zero_fd

    f.defvjp(fwd, bwd)
    return f


# ---------------------------------------------------------------------------
# SDDMM
# ---------------------------------------------------------------------------

def _sddmm_kernel(recv_ref, a_ref, b_ref, out_ref):
    """Per-block SDDMM: gather b rows via onehot matmul (MXU), then a
    row-wise dot (VPU). a_ref: [1, 1, E] local receiver ids; a_ref/b_ref as
    below; out_ref: [1, 1, E]."""
    e = recv_ref.shape[-1]
    r = b_ref.shape[1]
    recv = recv_ref[0, 0, :]
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (e, r), 1)
    onehot = (recv[:, None] == r_ids).astype(b_ref.dtype)
    b_rows = jax.lax.dot_general(
        onehot, b_ref[0, :, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [E, F]
    out_ref[0, 0, :] = jnp.sum(a_ref[0, :, :] * b_rows, axis=-1).astype(
        out_ref.dtype)


def sddmm_blocked(a: jax.Array, b: jax.Array, blocked: BlockedGraph,
                  impl: Impl = "pallas") -> jax.Array:
    """Blocked SDDMM: edge scores for the receiver-blocked layout.

    Returns [B, E_BLOCK] scores (padding edges produce garbage only where
    weights are 0 — mask with blocked.weights != 0 if needed).
    """
    a_g = a[blocked.senders]                             # [B, E, F]
    bm, e = blocked.senders.shape
    f = a.shape[-1]
    r = blocked.r_block
    b_pad = jnp.zeros((blocked.num_nodes_padded, f), b.dtype
                      ).at[:b.shape[0]].set(b)
    b_blocks = b_pad.reshape(bm, r, f)

    if impl == "jnp":
        r_ids = jnp.arange(r)
        onehot = (blocked.recv_local[:, :, None] == r_ids[None, None, :]
                  ).astype(b.dtype)
        b_rows = jnp.einsum("ber,brf->bef", onehot, b_blocks)
        return jnp.sum(a_g * b_rows, axis=-1)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        _sddmm_kernel,
        grid=(bm,),
        in_specs=[
            pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, 1, e), jnp.float32),
        interpret=(impl == "pallas_interpret"),
    )(blocked.recv_local[:, None, :], a_g, b_blocks)
    return out[:, 0, :]
