"""Paged-cell fused gather+reduce SpMM — EXPERIMENTAL (demoted round 5).

Round-4 degree sweep (docs/RESULTS.md "paged sweep"): this kernel loses to
the blocked kernel at every measured density (degrees 10-128 at ~1M edges)
and the windowed-dense layout dominates the high-degree geometric regime it
was kept for. Demoted out of `gnnra_tpu.graph` / `gnnra_tpu.ops.spmm` per
the round-4 verdict; retained here as the reference implementation of
in-kernel one-hot gathering (the [E, F] message tensor never exists in HBM).

Semantics identical to `ops.spmm.spmm_coo` on the same edges (reference
aggregation: /root/reference/BS_brain.py:69-76).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from gnnra_tpu.graph import COOGraph
from gnnra_tpu.ops.spmm import Impl


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PagedCellGraph:
    """Paged (receiver-block x sender-chunk) cell layout for the fused
    gather+reduce SpMM kernel (`spmm_paged`).

    Edges are bucketed into cells (receiver block b of R_BLOCK rows, sender
    chunk c of CHUNK rows) and each cell's slots are split into fixed-size
    PAGES (PAGE edge slots). One kernel grid step processes one page: the
    sender chunk is DMA'd into VMEM (BlockSpec-indexed by the prefetched
    `chunk_ids`), message rows are gathered from it with a one-hot MXU
    matmul (so the [E, F] message tensor NEVER exists in HBM — the round
    trip that dominates the unfused kernel's traffic, docs/RESULTS.md), and
    the weighted one-hot reduction accumulates into the output block, which
    stays VMEM-resident across the block's consecutive pages.

    Unlike the uniform per-cell padding of `TwoLevelBlockedGraph` (which
    pays the MAX cell occupancy in every cell — 2-8x waste on geometric
    graphs whose near-diagonal cells are dense), paging wastes at most
    PAGE-1 slots per cell: ~30-50% on BFS-ordered vehicular topologies.

    Layout contract: pages are sorted by (block, chunk); every receiver
    block owns at least one page (empty filler pages have weight 0), so
    every output block is visited and zero-initialized.
    """

    senders: jax.Array     # [P, PAGE] int32 CHUNK-LOCAL sender ids (pad 0)
    recv_local: jax.Array  # [P, PAGE] int32 block-local receiver (pad 0)
    weights: jax.Array     # [P, PAGE] f32 edge weights (pad 0)
    block_ids: jax.Array   # [P] int32 receiver-block index per page
    chunk_ids: jax.Array   # [P] int32 sender-chunk index per page
    first_flags: jax.Array  # [P] int32 1 iff first page of its block
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    num_nodes_padded: int = dataclasses.field(metadata=dict(static=True))
    num_chunks_padded: int = dataclasses.field(metadata=dict(static=True))
    r_block: int = dataclasses.field(metadata=dict(static=True))
    chunk: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_pages(self) -> int:
        return int(self.senders.shape[0])

    @property
    def page(self) -> int:
        return int(self.senders.shape[1])


def page_cells(graph: COOGraph, r_block: int = 128, chunk: int = 128,
               page: int = 256) -> PagedCellGraph:
    """Host-side O(E) preprocessing into the paged-cell layout.

    Best used after `reorder_nodes(graph, 'bfs')` on geometric topologies:
    narrow sender windows per receiver block mean few distinct chunks per
    block, so consecutive pages share their chunk and the chunk DMA
    amortizes (the kernel's HBM traffic is ~one chunk load per non-empty
    cell + the edge arrays; see PagedCellGraph docstring).
    """
    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    weights = np.asarray(graph.weights)
    n = graph.num_nodes
    e = senders.shape[0]
    num_blocks = max(1, -(-n // r_block))
    num_chunks = max(1, -(-n // chunk))

    block_of = receivers // r_block
    chunk_of = senders // chunk
    cell = block_of.astype(np.int64) * num_chunks + chunk_of
    order = np.argsort(cell, kind="stable")
    cell_sorted = cell[order]

    # unique cells in sorted order + their edge counts
    uniq_cells, cell_start = np.unique(cell_sorted, return_index=True)
    cell_count = np.diff(np.concatenate([cell_start, [e]]))
    pages_per_cell = -(-cell_count // page)

    # guarantee >= 1 page per receiver block (filler page, weight 0)
    blocks_seen = np.unique(uniq_cells // num_chunks)
    missing_blocks = np.setdiff1d(np.arange(num_blocks), blocks_seen)

    total_pages = int(pages_per_cell.sum()) + missing_blocks.shape[0]
    s_out = np.zeros((total_pages, page), np.int32)
    r_out = np.zeros((total_pages, page), np.int32)
    w_out = np.zeros((total_pages, page), np.float32)
    pg_block = np.zeros(total_pages, np.int32)
    pg_chunk = np.zeros(total_pages, np.int32)

    # merge real cells and filler pages in block order
    page_pos = 0
    ci = 0
    mi = 0
    n_cells = uniq_cells.shape[0]
    while ci < n_cells or mi < missing_blocks.shape[0]:
        next_real_block = (int(uniq_cells[ci] // num_chunks)
                           if ci < n_cells else np.iinfo(np.int64).max)
        next_missing = (int(missing_blocks[mi])
                        if mi < missing_blocks.shape[0]
                        else np.iinfo(np.int64).max)
        if next_missing < next_real_block:
            pg_block[page_pos] = next_missing
            pg_chunk[page_pos] = 0
            page_pos += 1
            mi += 1
            continue
        b = next_real_block
        c = int(uniq_cells[ci] % num_chunks)
        start = int(cell_start[ci])
        count = int(cell_count[ci])
        for p0 in range(0, count, page):
            take = min(page, count - p0)
            rows = order[start + p0:start + p0 + take]
            s_out[page_pos, :take] = senders[rows] - c * chunk
            r_out[page_pos, :take] = receivers[rows] - b * r_block
            w_out[page_pos, :take] = weights[rows]
            pg_block[page_pos] = b
            pg_chunk[page_pos] = c
            page_pos += 1
        ci += 1
    assert page_pos == total_pages

    first = np.zeros(total_pages, np.int32)
    first[0] = 1
    first[1:] = (pg_block[1:] != pg_block[:-1]).astype(np.int32)
    # paranoia: pages of a block must be contiguous (accumulation contract)
    assert first.sum() == np.unique(pg_block).shape[0]

    return PagedCellGraph(
        senders=jnp.asarray(s_out), recv_local=jnp.asarray(r_out),
        weights=jnp.asarray(w_out), block_ids=jnp.asarray(pg_block),
        chunk_ids=jnp.asarray(pg_chunk), first_flags=jnp.asarray(first),
        num_nodes=n, num_nodes_padded=num_blocks * r_block,
        num_chunks_padded=num_chunks * chunk, r_block=r_block, chunk=chunk,
        num_edges=e)


def _paged_kernel(chunk_ids_ref, block_ids_ref, first_ref,
                  senders_ref, recv_ref, w_ref, h_ref, out_ref):
    """One grid step = one edge page.

    The sender chunk for this page is already in VMEM (h_ref, BlockSpec-
    indexed by the prefetched chunk id); message rows are gathered from it
    with a one-hot MXU matmul, weighted on the VPU, and reduced into the
    VMEM-resident output block with a second one-hot matmul. The [E, F]
    message tensor never exists in HBM — the round trip that is ~2/3 of the
    unfused kernel's traffic (docs/RESULTS.md).

    h_ref: [CHUNK, F]; senders/recv/w: [1, PAGE]; out_ref: [R_BLOCK, F] f32.
    """
    p = pl.program_id(0)
    del chunk_ids_ref, block_ids_ref                  # consumed by index maps
    s_local = senders_ref[0, 0, :]                    # [PG]
    r_local = recv_ref[0, 0, :]                       # [PG]
    w = w_ref[0, 0, :]                                # [PG]
    h = h_ref[:]                                      # [S, F]
    pg = s_local.shape[0]
    s = h.shape[0]
    r = out_ref.shape[0]
    # Mosaic supports DEFAULT (bf16 multiply) and HIGHEST (fp32 contract)
    # only; f32 inputs must use HIGHEST to keep f32 accuracy through the
    # one-hot matmuls. This kernel is MXU-bound, so the fast path is bf16
    # (the scaled configs' dtype) — f32 pays the multi-pass fp32 rate.
    precision = (jax.lax.Precision.HIGHEST
                 if h.dtype == jnp.float32 else None)

    s_ids = jax.lax.broadcasted_iota(jnp.int32, (pg, s), 1)
    onehot_s = (s_local[:, None] == s_ids).astype(h.dtype)
    msgs = jax.lax.dot_general(
        onehot_s, h, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)  # [PG, F]
    msgs = msgs * w[:, None]
    msgs = msgs.astype(h.dtype)

    r_ids = jax.lax.broadcasted_iota(jnp.int32, (pg, r), 1)
    onehot_r = (r_local[:, None] == r_ids).astype(h.dtype)
    part = jax.lax.dot_general(
        onehot_r, msgs, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)  # [R, F]

    first = first_ref[p]

    @pl.when(first == 1)
    def _():
        out_ref[:] = part

    @pl.when(first == 0)
    def _():
        out_ref[:] = out_ref[:] + part


def _spmm_paged_pallas(h: jax.Array, paged: PagedCellGraph,
                       interpret: bool = False) -> jax.Array:
    from jax.experimental.pallas import tpu as pltpu

    f = h.shape[-1]
    s = paged.chunk
    r = paged.r_block
    pg = paged.page
    n_pages = paged.num_pages
    h_pad = jnp.zeros((paged.num_chunks_padded, f), h.dtype
                      ).at[:h.shape[0]].set(h)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pages,),
        in_specs=[
            # per-page vectors carry a dummy sublane axis so the block shape
            # meets the TPU (sublane, lane) tiling rules
            pl.BlockSpec((1, 1, pg), lambda p, ci, bi, ff: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pg), lambda p, ci, bi, ff: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pg), lambda p, ci, bi, ff: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, f), lambda p, ci, bi, ff: (ci[p], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, f), lambda p, ci, bi, ff: (bi[p], 0),
                               memory_space=pltpu.VMEM),
    )
    flops_per_page = 2 * pg * (s + r) * f
    out = pl.pallas_call(
        _paged_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((paged.num_nodes_padded, f),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_page * n_pages,
            bytes_accessed=(n_pages * (s * f * h.dtype.itemsize + pg * 12)
                            + paged.num_nodes_padded * f * 4),
            transcendentals=0),
        interpret=interpret,
    )(paged.chunk_ids, paged.block_ids, paged.first_flags,
      paged.senders[:, None, :], paged.recv_local[:, None, :],
      paged.weights[:, None, :], h_pad)
    return out[:paged.num_nodes].astype(h.dtype)


def _spmm_paged_jnp(h: jax.Array, paged: PagedCellGraph) -> jax.Array:
    """Vectorized jnp oracle/fallback for the paged kernel (same math)."""
    f = h.shape[-1]
    s = paged.chunk
    r = paged.r_block
    h_pad = jnp.zeros((paged.num_chunks_padded, f), h.dtype
                      ).at[:h.shape[0]].set(h)
    chunks = h_pad.reshape(-1, s, f)
    hsel = chunks[paged.chunk_ids]                       # [P, S, F]
    msgs = jnp.take_along_axis(
        hsel, paged.senders[:, :, None], axis=1)          # [P, PG, F]
    msgs = msgs.astype(jnp.float32) * paged.weights[:, :, None]
    num_blocks = paged.num_nodes_padded // r
    out = jnp.zeros((num_blocks, r, f), jnp.float32)
    out = out.at[paged.block_ids[:, None, None],
                 paged.recv_local[:, :, None],
                 jnp.arange(f)[None, None, :]].add(msgs)
    return out.reshape(-1, f)[:paged.num_nodes].astype(h.dtype)


def spmm_paged(h: jax.Array, paged: PagedCellGraph,
               impl: Impl = "pallas") -> jax.Array:
    """Fused-gather SpMM over a `PagedCellGraph`.

    For geometric/BFS-ordered topologies (narrow sender windows per
    receiver block) this eliminates the [E, F] HBM message round trip of
    `spmm_blocked` entirely: the gather happens on the MXU from a VMEM-
    resident sender chunk. Semantics identical to `spmm_coo` on the same
    edges (reference aggregation semantics: BS_brain.py:69-76).
    """
    if impl == "jnp":
        return _spmm_paged_jnp(h, paged)
    return _spmm_paged_pallas(h, paged, interpret=(impl == "pallas_interpret"))


def make_spmm_paged(fwd_paged: PagedCellGraph, bwd_paged: PagedCellGraph,
                    impl: Impl = "pallas"):
    """Differentiable paged SpMM closed over (forward, transposed) layouts;
    the backward is the same fused kernel on the transposed graph
    (dL/dh[s] = sum_{e: send_e = s} w_e g[recv_e])."""

    @jax.custom_vjp
    def spmm(h):
        return spmm_paged(h, fwd_paged, impl)

    def fwd(h):
        return spmm(h), None

    def bwd(_, g):
        return (spmm_paged(g, bwd_paged, impl),)

    spmm.defvjp(fwd, bwd)
    return spmm
