"""Graph containers for arbitrary-size interference graphs.

The reference caps its graph at 4 nodes and lifts the dense [4,4] adjacency to
a 64x64 block matrix (BS_brain.py:492-493). For the scaled/synthetic configs
(BASELINE.json configs 4-5) we need COO/CSR graphs with 10^5..10^7 edges and
a layout that keeps TPU aggregation on the MXU:

  * `COOGraph`: raw (senders, receivers, weights) edge list, static length.
  * `BlockedGraph`: edges grouped by receiver block (R_BLOCK consecutive
    receiver rows), padded to a uniform per-block edge budget. Aggregation
    for block b is then `onehot(recv_local)^T @ messages` — a dense
    [E_BLOCK, R_BLOCK] x [E_BLOCK, F] matmul per block, which is exactly the
    shape the MXU wants, with the one-hot built on the fly in-kernel (no HBM
    traffic). Padding edges point at sender 0 with weight 0.

Preprocessing runs on host NumPy once per graph topology (cheap vs training)
and returns static-shape device arrays suitable for jit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class COOGraph:
    """Static-shape COO edge list (senders -> receivers). Registered as a
    pytree (num_nodes static) so graphs pass through jit as traced args."""

    senders: jax.Array     # [E] int32
    receivers: jax.Array   # [E] int32
    weights: jax.Array     # [E] float32 (1.0 for unweighted; 0 marks padding)
    num_nodes: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_edges(self) -> int:
        return int(self.senders.shape[0])

    def transpose(self) -> "COOGraph":
        """Reverse every edge (for the aggregation VJP: dL/dh = A @ g)."""
        return COOGraph(senders=self.receivers, receivers=self.senders,
                        weights=self.weights, num_nodes=self.num_nodes)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockedGraph:
    """Receiver-blocked, padded edge layout for the Pallas SpMM kernel.
    Registered as a pytree (shape metadata static)."""

    senders: jax.Array       # [B, E_BLOCK] int32 (padding -> 0)
    recv_local: jax.Array    # [B, E_BLOCK] int32 in [0, R_BLOCK)
    weights: jax.Array       # [B, E_BLOCK] float32 (padding -> 0)
    # original COO edge id per slot; padding slots -> num_edges (one past
    # the end), so learnable per-edge weights can be gathered/scattered
    # between layouts through an [num_edges+1]-sized buffer
    edge_ids: jax.Array      # [B, E_BLOCK] int32
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    num_nodes_padded: int = dataclasses.field(metadata=dict(static=True))
    r_block: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_blocks(self) -> int:
        return int(self.senders.shape[0])

    @property
    def e_block(self) -> int:
        return int(self.senders.shape[1])


def random_graph(key: jax.Array, num_nodes: int, num_edges: int,
                 weighted: bool = False) -> COOGraph:
    """Uniform random directed graph (the synthetic benchmark topology)."""
    k_s, k_r, k_w = jax.random.split(key, 3)
    senders = jax.random.randint(k_s, (num_edges,), 0, num_nodes, jnp.int32)
    receivers = jax.random.randint(k_r, (num_edges,), 0, num_nodes, jnp.int32)
    weights = (jax.random.uniform(k_w, (num_edges,))
               if weighted else jnp.ones((num_edges,)))
    return COOGraph(senders=senders, receivers=receivers, weights=weights,
                    num_nodes=num_nodes)


def random_graph_host(seed: int, num_nodes: int, num_edges: int,
                      weighted: bool = False) -> COOGraph:
    """Host-side (NumPy) random graph — avoids device->host pulls during
    preprocessing when the graph is only needed as a topology."""
    rng = np.random.RandomState(seed)
    senders = rng.randint(0, num_nodes, num_edges).astype(np.int32)
    receivers = rng.randint(0, num_nodes, num_edges).astype(np.int32)
    weights = (rng.rand(num_edges).astype(np.float32)
               if weighted else np.ones(num_edges, np.float32))
    return COOGraph(senders=senders, receivers=receivers, weights=weights,
                    num_nodes=num_nodes)


def from_dense_adjacency(adj: np.ndarray) -> COOGraph:
    """COO edges (i -> j) for every nonzero adj[i, j] — the same convention
    as ops.aggregate_dense (agg_j = sum_i adj[i,j] h_i)."""
    senders, receivers = np.nonzero(adj)
    weights = adj[senders, receivers].astype(np.float32)
    return COOGraph(senders=jnp.asarray(senders, jnp.int32),
                    receivers=jnp.asarray(receivers, jnp.int32),
                    weights=jnp.asarray(weights),
                    num_nodes=adj.shape[0])


def block_by_receiver(graph: COOGraph, r_block: int = 128,
                      e_block_multiple: int = 8,
                      e_block: Optional[int] = None,
                      use_native: bool = True) -> BlockedGraph:
    """Group edges by receiver block and pad to a uniform per-block budget.

    Host-side preprocessing: a single O(E) bucket-fill pass in the native
    C++ library (gnnra_tpu/native/blocking.cpp) when available, otherwise a
    vectorized NumPy scatter. For uniform random graphs the max/mean block
    occupancy ratio is small (~1.1x at 1k+ edges/block) so single uniform
    padding wastes little; callers with power-law graphs can pass an
    explicit e_block. Measured on TPU v5e: r_block=256 is optimal at both
    1M- and 10M-edge scale (128 costs ~2x at 10M edges; 512 pays ~4x MXU
    work in the one-hot reduction — docs/RESULTS.md sweep).
    """
    senders = np.ascontiguousarray(np.asarray(graph.senders), np.int32)
    receivers = np.ascontiguousarray(np.asarray(graph.receivers), np.int32)
    weights = np.ascontiguousarray(np.asarray(graph.weights), np.float32)
    n = graph.num_nodes
    e = senders.shape[0]
    num_blocks = max(1, -(-n // r_block))
    n_padded = num_blocks * r_block

    block_ids = receivers // r_block
    counts = np.bincount(block_ids, minlength=num_blocks)
    if e_block is None:
        e_max = int(counts.max()) if counts.size else 1
        e_blk = max(e_block_multiple,
                    -(-e_max // e_block_multiple) * e_block_multiple)
    else:
        e_blk = e_block
        assert counts.max() <= e_blk, (
            f"block overflow: max {counts.max()} edges > e_block {e_blk}")

    s_out = np.zeros((num_blocks, e_blk), np.int32)
    r_out = np.zeros((num_blocks, e_blk), np.int32)
    w_out = np.zeros((num_blocks, e_blk), np.float32)
    id_out = np.full((num_blocks, e_blk), e, np.int32)   # padding id = E

    lib = None
    if use_native:
        from gnnra_tpu.native import get_lib
        lib = get_lib()
    if lib is not None:
        import ctypes
        rc = lib.fill_receiver_blocks(
            senders.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            receivers.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            weights.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            e, r_block, num_blocks, e_blk,
            s_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            r_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            w_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            id_out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        assert rc == 0, "native blocking reported block overflow"
    else:
        # vectorized scatter: stable sort by block, then slot index within
        # block = rank - block start
        order = np.argsort(block_ids, kind="stable")
        sorted_blocks = block_ids[order]
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        slots = np.arange(e, dtype=np.int64) - starts[sorted_blocks]
        s_out[sorted_blocks, slots] = senders[order]
        r_out[sorted_blocks, slots] = receivers[order] - \
            sorted_blocks.astype(np.int32) * r_block
        w_out[sorted_blocks, slots] = weights[order]
        id_out[sorted_blocks, slots] = order.astype(np.int32)

    return BlockedGraph(senders=jnp.asarray(s_out),
                        recv_local=jnp.asarray(r_out),
                        weights=jnp.asarray(w_out),
                        edge_ids=jnp.asarray(id_out),
                        num_nodes=n, num_nodes_padded=n_padded,
                        r_block=r_block, num_edges=graph.num_edges)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TwoLevelBlockedGraph:
    """Receiver-blocked AND sender-chunked edge layout.

    Single-level blocking gathers `h[senders]` from the full [N, F] table;
    at BASELINE config-5 scale (1M nodes, 512 MB f32 table) that random
    gather runs ~3x slower per edge than from a <=100 MB table (measured,
    docs/RESULTS.md). Here each receiver block's edge slots are segmented
    by sender chunk (C chunks of `chunk_size` nodes): the gather becomes C
    static-sliced gathers, each reading only a [chunk_size, F] table slice
    that stays DRAM-page/TLB-local, while the one-hot segment reduction
    still sees one contiguous [B, C*E_CELL] slot axis — a single MXU matmul
    per block, exactly as before. Cost: per-(block, chunk) uniform padding
    (E_CELL = max cell occupancy) instead of per-block.
    """

    senders: jax.Array      # [C, B, E_CELL] int32, CHUNK-LOCAL (pad -> 0)
    recv_local: jax.Array   # [B, C*E_CELL] int32 (chunk-major slot order)
    weights: jax.Array      # [B, C*E_CELL] f32 (pad -> 0)
    edge_ids: jax.Array     # [B, C*E_CELL] int32 (pad -> num_edges)
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    num_nodes_padded: int = dataclasses.field(metadata=dict(static=True))
    r_block: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))
    chunk_size: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_chunks(self) -> int:
        return int(self.senders.shape[0])

    @property
    def num_blocks(self) -> int:
        return int(self.senders.shape[1])

    @property
    def e_cell(self) -> int:
        return int(self.senders.shape[2])


def block_two_level(graph: COOGraph, r_block: int = 128,
                    num_chunks: int = 8,
                    e_cell_multiple: int = 8) -> TwoLevelBlockedGraph:
    """Host-side O(E) preprocessing into the two-level layout."""
    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    weights = np.asarray(graph.weights)
    n = graph.num_nodes
    e = senders.shape[0]
    num_blocks = max(1, -(-n // r_block))
    n_padded = num_blocks * r_block
    chunk_size = -(-n // num_chunks)
    c = num_chunks

    block_ids = receivers // r_block
    chunk_ids = senders // chunk_size
    cell = block_ids.astype(np.int64) * c + chunk_ids
    counts = np.bincount(cell, minlength=num_blocks * c)
    e_max = int(counts.max()) if counts.size else 1
    e_cell = max(e_cell_multiple,
                 -(-e_max // e_cell_multiple) * e_cell_multiple)

    s_out = np.zeros((c, num_blocks, e_cell), np.int32)
    r_out = np.zeros((num_blocks, c, e_cell), np.int32)
    w_out = np.zeros((num_blocks, c, e_cell), np.float32)
    id_out = np.full((num_blocks, c, e_cell), e, np.int32)

    order = np.argsort(cell, kind="stable")
    sorted_cells = cell[order]
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    slots = np.arange(e, dtype=np.int64) - starts[sorted_cells]
    b_idx = (sorted_cells // c).astype(np.int64)
    c_idx = (sorted_cells % c).astype(np.int64)
    s_out[c_idx, b_idx, slots] = (senders[order]
                                  - c_idx.astype(np.int32) * chunk_size)
    r_out[b_idx, c_idx, slots] = (receivers[order]
                                  - b_idx.astype(np.int32) * r_block)
    w_out[b_idx, c_idx, slots] = weights[order]
    id_out[b_idx, c_idx, slots] = order.astype(np.int32)

    return TwoLevelBlockedGraph(
        senders=jnp.asarray(s_out),
        recv_local=jnp.asarray(r_out.reshape(num_blocks, c * e_cell)),
        weights=jnp.asarray(w_out.reshape(num_blocks, c * e_cell)),
        edge_ids=jnp.asarray(id_out.reshape(num_blocks, c * e_cell)),
        num_nodes=n, num_nodes_padded=n_padded, r_block=r_block,
        num_edges=e, chunk_size=chunk_size)


def sort_block_slots_by_sender(blocked: BlockedGraph) -> BlockedGraph:
    """Permute edge slots within each receiver block so senders ascend.

    The SpMM gather `h[senders]` is the bandwidth bottleneck at scale
    (10M random rows from a 512MB table, BASELINE config 5); slot order
    within a block is free (the one-hot reduction is order-invariant), and
    an ascending address stream maximizes DRAM page/row-buffer hits for
    the gather engine. Host-side O(E log E_BLOCK) preprocessing.
    """
    s = np.asarray(blocked.senders)
    r = np.asarray(blocked.recv_local)
    w = np.asarray(blocked.weights)
    ids = np.asarray(blocked.edge_ids)
    # order padding slots (weight 0, sender 0) first; harmless either way
    order = np.argsort(s, axis=1, kind="stable")
    take = np.take_along_axis
    return BlockedGraph(
        senders=jnp.asarray(take(s, order, axis=1)),
        recv_local=jnp.asarray(take(r, order, axis=1)),
        weights=jnp.asarray(take(w, order, axis=1)),
        edge_ids=jnp.asarray(take(ids, order, axis=1)),
        num_nodes=blocked.num_nodes,
        num_nodes_padded=blocked.num_nodes_padded,
        r_block=blocked.r_block, num_edges=blocked.num_edges)


def reorder_nodes(graph: COOGraph, method: str = "degree"
                  ) -> Tuple[COOGraph, np.ndarray]:
    """Relabel nodes to improve SpMM gather locality on structured graphs.

    Returns (relabeled graph, perm) where perm[new_id] = old_id; features
    must be permuted to match (`h_new = h_old[perm]`) and outputs map back
    with `out_old = out_new[inv]` via `inverse_permutation(perm)`.

    Methods:
      * 'degree': sort nodes by descending out-degree — hot senders cluster
        at low addresses so the gather's working set concentrates (helps
        power-law graphs; a uniform random graph has no locality to mine).
      * 'bfs': breadth-first relabeling from node 0 (RCM-style) — neighbors
        get nearby ids, concentrating both gather and scatter ranges for
        graphs with community/geometric structure (e.g. interference
        graphs, meshes).
    """
    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    n = graph.num_nodes
    if method == "degree":
        out_deg = np.bincount(senders, minlength=n)
        perm = np.argsort(-out_deg, kind="stable").astype(np.int32)
    elif method == "bfs":
        # CSR over the undirected edge set, then BFS from every unvisited
        # node in ascending id order (handles disconnected graphs)
        und_s = np.concatenate([senders, receivers])
        und_r = np.concatenate([receivers, senders])
        order = np.argsort(und_s, kind="stable")
        sorted_r = und_r[order]
        counts = np.bincount(und_s, minlength=n)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        visited = np.zeros(n, bool)
        perm = np.empty(n, np.int32)
        out_pos = 0
        from collections import deque
        for start in range(n):
            if visited[start]:
                continue
            visited[start] = True
            queue = deque([start])
            while queue:
                u = queue.popleft()
                perm[out_pos] = u
                out_pos += 1
                for v in sorted_r[offsets[u]:offsets[u + 1]]:
                    if not visited[v]:
                        visited[v] = True
                        queue.append(v)
        assert out_pos == n
    else:
        raise ValueError(f"unknown reorder method {method!r}")

    inv = inverse_permutation(perm)
    new = COOGraph(senders=jnp.asarray(inv[senders], jnp.int32),
                   receivers=jnp.asarray(inv[receivers], jnp.int32),
                   weights=graph.weights, num_nodes=n)
    return new, perm


def inverse_permutation(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0], dtype=perm.dtype)
    return inv


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CSRGraph:
    """Receiver-sorted CSR layout: edges incoming to node r live at
    [offsets[r], offsets[r+1]). Host-built once per topology; device
    arrays so `sample_neighbors` runs under jit."""

    offsets: jax.Array     # [N+1] int32
    senders: jax.Array     # [E] int32 (sorted by receiver)
    weights: jax.Array     # [E] float32
    num_nodes: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_edges(self) -> int:
        return int(self.senders.shape[0])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FixedDegreeGraph:
    """Uniform-K sampled neighborhood (BASELINE config 4 "neighbor
    sampling"): exactly K in-edges per node. The layout is MXU/gather
    friendly — aggregation needs no one-hot or segment ids at all, just a
    [N, K] row gather and a weighted reduction over K
    (`ops.spmm.spmm_fixed_degree`)."""

    senders: jax.Array     # [N, K] int32 (self-pointing slots have weight 0)
    weights: jax.Array     # [N, K] float32; d/K importance scaling included
    num_nodes: int = dataclasses.field(metadata=dict(static=True))

    @property
    def k(self) -> int:
        return int(self.senders.shape[1])


def to_csr(graph: COOGraph) -> CSRGraph:
    """Host-side COO -> receiver-sorted CSR (O(E) counting sort)."""
    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    weights = np.asarray(graph.weights)
    n = graph.num_nodes
    order = np.argsort(receivers, kind="stable")
    counts = np.bincount(receivers, minlength=n)
    offsets = np.zeros(n + 1, np.int32)
    np.cumsum(counts, out=offsets[1:])
    return CSRGraph(offsets=jnp.asarray(offsets),
                    senders=jnp.asarray(senders[order]),
                    weights=jnp.asarray(weights[order]),
                    num_nodes=n)


def sample_neighbors(key: jax.Array, csr: CSRGraph, k: int
                     ) -> FixedDegreeGraph:
    """Uniform-with-replacement K-neighbor sampling (GraphSAGE-style),
    fully on device / under jit.

    Per node r with in-degree d: draw K edge slots uniformly from its CSR
    row; the sampled weight is w_e * d / K, making the sampled aggregation
    an unbiased estimator of the full-sum SpMM
    (E[sum_k w_k h_k] = sum_e w_e h_e). Degree-0 nodes get weight 0.
    """
    n = csr.num_nodes
    starts = csr.offsets[:-1]                            # [N]
    degs = csr.offsets[1:] - starts                      # [N]
    u = jax.random.uniform(key, (n, k))
    # floor(u * d) in [0, d); d = 0 rows clamp to slot 0 and are masked
    pick = starts[:, None] + jnp.minimum(
        (u * degs[:, None]).astype(jnp.int32),
        jnp.maximum(degs[:, None] - 1, 0))
    senders = csr.senders[pick]                          # [N, K]
    w = csr.weights[pick] * (degs[:, None].astype(jnp.float32) / k)
    w = jnp.where(degs[:, None] > 0, w, 0.0)
    senders = jnp.where(degs[:, None] > 0, senders,
                        jnp.arange(n, dtype=jnp.int32)[:, None])
    return FixedDegreeGraph(senders=senders, weights=w, num_nodes=n)


def partition_edges(graph: COOGraph, num_partitions: int
                    ) -> Tuple[COOGraph, ...]:
    """Split the edge list into contiguous shards (for edge-partitioned
    multi-chip aggregation, BASELINE config 5). Each shard keeps global node
    ids; partial aggregates are combined with a psum/reduce-scatter."""
    e = graph.num_edges
    per = -(-e // num_partitions)
    shards = []
    for p in range(num_partitions):
        lo, hi = p * per, min((p + 1) * per, e)
        pad = per - (hi - lo)
        s = jnp.concatenate([graph.senders[lo:hi],
                             jnp.zeros((pad,), jnp.int32)])
        r = jnp.concatenate([graph.receivers[lo:hi],
                             jnp.zeros((pad,), jnp.int32)])
        w = jnp.concatenate([graph.weights[lo:hi], jnp.zeros((pad,))])
        shards.append(COOGraph(senders=s, receivers=r, weights=w,
                               num_nodes=graph.num_nodes))
    return tuple(shards)
