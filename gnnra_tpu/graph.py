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
        # node in ascending id order (handles disconnected graphs). The
        # traversal runs in the native library when available (Python BFS:
        # ~6.5 min at 1M nodes / 10M edges; native: seconds).
        und_s = np.concatenate([senders, receivers])
        und_r = np.concatenate([receivers, senders])
        order = np.argsort(und_s, kind="stable")
        sorted_r = np.ascontiguousarray(und_r[order], np.int32)
        counts = np.bincount(und_s, minlength=n)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        perm = np.empty(n, np.int32)
        from gnnra_tpu.native import get_lib
        lib = get_lib()
        if lib is not None:
            import ctypes
            lib.bfs_order(
                offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                sorted_r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                n, perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        else:
            visited = np.zeros(n, bool)
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
    edge_ids: jax.Array    # [E] int32 original COO edge id per CSR slot
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
    # original COO edge id per sampled slot (degree-0 slots -> E sentinel);
    # lets the blocked-transpose backward accumulate sampled weights per
    # edge (ops.spmm.make_spmm_sampled)
    edge_ids: jax.Array    # [N, K] int32
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
                    edge_ids=jnp.asarray(order.astype(np.int32)),
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
    edge_ids = jnp.where(degs[:, None] > 0, csr.edge_ids[pick],
                         jnp.int32(csr.num_edges))
    return FixedDegreeGraph(senders=senders, weights=w, edge_ids=edge_ids,
                            num_nodes=n)


def geometric_interference_graph(seed: int, num_nodes: int,
                                 target_degree: float = 10.0,
                                 road_density: float = 0.25
                                 ) -> Tuple[np.ndarray, COOGraph]:
    """Scaled synthetic analog of the reference's interference topology.

    The reference builds its graph from pairwise vehicle distances on a
    Manhattan road grid (Environment.py:360-376 over positions evolved by
    Environment.py:217-345); this generator reproduces that *structure* at
    arbitrary scale: vehicles constrained to a grid of horizontal/vertical
    roads over an area scaled to constant vehicular density, edges between
    all pairs closer than a radius chosen for the target mean degree.
    Edge discovery is O(E) via spatial hashing (cell binning), so million-
    node graphs preprocess in seconds.

    Unlike `random_graph`, the result has geometric locality — the topology
    where `reorder_nodes('bfs')` + the windowed-dense SpMM layout pay off.

    Returns (positions [N,2] float32, COOGraph) — both directions of every
    undirected pair are emitted as directed edges.
    """
    rng = np.random.RandomState(seed)
    n = num_nodes
    area = n * 1500.0                       # ~1 vehicle / 1500 m^2 like the
    w = float(np.sqrt(area * 750.0 / 1299.0))   # 750x1299 reference area
    h = area / w
    n_roads = max(4, int(np.sqrt(n) * road_density))
    xs_roads = np.linspace(0.0, w, n_roads)
    ys_roads = np.linspace(0.0, h, n_roads)
    horiz = rng.rand(n) < 0.5
    x = np.where(horiz, rng.rand(n) * w, xs_roads[rng.randint(0, n_roads, n)])
    y = np.where(horiz, ys_roads[rng.randint(0, n_roads, n)], rng.rand(n) * h)
    pos = np.stack([x, y], axis=1).astype(np.float32)

    # radius for the target degree, inflated because vehicles concentrate on
    # roads rather than filling the area uniformly
    radius = float(np.sqrt(target_degree * area / (np.pi * n)))

    def edges_for_radius(r):
        cx = (pos[:, 0] // r).astype(np.int64)
        cy = (pos[:, 1] // r).astype(np.int64)
        key = cx * 1_000_003 + cy
        order = np.argsort(key, kind="stable")
        ks = key[order]
        uniq, first = np.unique(ks, return_index=True)
        idx_of = {int(k): int(f) for k, f in zip(uniq, first)}
        cnt_of = {int(k): int(c) for k, c in zip(
            uniq, np.diff(np.concatenate([first, [n]])))}
        s_parts, r_parts = [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nk = (cx + dx) * 1_000_003 + (cy + dy)
                f = np.fromiter((idx_of.get(int(k), 0) for k in nk),
                                np.int64, n)
                c = np.fromiter((cnt_of.get(int(k), 0) for k in nk),
                                np.int64, n)
                tot = int(c.sum())
                if tot == 0:
                    continue
                rep_i = np.repeat(np.arange(n), c)
                offs = np.concatenate([[0], np.cumsum(c)])[:-1]
                pos_in = (np.arange(tot) - np.repeat(offs, c)
                          + np.repeat(f, c))
                j = order[pos_in]
                d = np.linalg.norm(pos[rep_i] - pos[j], axis=1)
                m = (d < r) & (rep_i != j)
                s_parts.append(j[m])
                r_parts.append(rep_i[m])
        return (np.concatenate(s_parts).astype(np.int32),
                np.concatenate(r_parts).astype(np.int32))

    # one adjustment pass toward the target degree
    senders, receivers = edges_for_radius(radius)
    deg = senders.shape[0] / n
    if deg > 0:
        radius *= float(np.sqrt(target_degree / deg))
        senders, receivers = edges_for_radius(radius)

    graph = COOGraph(senders=jnp.asarray(senders),
                     receivers=jnp.asarray(receivers),
                     weights=jnp.ones((senders.shape[0],), jnp.float32),
                     num_nodes=n)
    return pos, graph


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowedDenseGraph:
    """Dense sender-window layout for geometric/BFS-ordered topologies.

    After BFS relabeling, all senders reaching a block of R_BLOCK
    consecutive receivers fall inside a narrow window of node ids (measured
    max span ~1900 for 256-row blocks on 100k-node vehicular-geometric
    graphs). The block's local adjacency is then a small DENSE [R_BLOCK, W]
    tile: SpMM becomes one MXU matmul per block against the [W, F] window
    of h — no gather of any kind, A tiles and h windows both stream
    sequentially from HBM (`ops.spmm.spmm_windowed`).

    Memory: A is num_blocks * R_BLOCK * W * itemsize = N * W * itemsize
    bytes (~410 MB bf16 at N=100k, W=2048) — the trade of ~16x more bytes
    per edge (at degree 10) for perfectly sequential, MXU-shaped traffic.
    Use for moderate-N geometric graphs; at N >= 1M prefer the blocked /
    two-level layouts.
    """

    # A is stored 2-D [B*R_BLOCK, W]: rows of block b at [b*R, (b+1)*R).
    # This is a TPU DMA-path invariant, not cosmetics: bf16 HBM->VMEM
    # streaming of (1, R, W) blocks of a 3-D array runs at ~83 GB/s vs
    # ~383 GB/s for (R, W) blocks of the equivalent 2-D array (measured;
    # the leading singleton block dim forces a slow path for 16-bit tiles).
    a_dense: jax.Array      # [B*R_BLOCK, W] edge weights (0 = no edge)
    w_start: jax.Array      # [B] int32 first h row of each block's window
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    num_nodes_padded: int = dataclasses.field(metadata=dict(static=True))
    r_block: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_blocks(self) -> int:
        return int(self.a_dense.shape[0]) // self.r_block

    @property
    def window(self) -> int:
        return int(self.a_dense.shape[1])


def window_dense(graph: COOGraph, r_block: int = 256,
                 window: Optional[int] = None,
                 dtype=jnp.bfloat16) -> WindowedDenseGraph:
    """Host-side O(E + N*W/r_block...) preprocessing into the dense-window
    layout. Requires every block's sender span <= window (raise otherwise —
    run `reorder_nodes(graph, 'bfs')` first on geometric topologies).

    window=None picks the smallest multiple of 128 covering the widest
    block's (8-aligned) sender span — the A tiles are the dominant HBM
    traffic of `spmm_windowed`, so the window should be as tight as the
    graph allows (plain-BFS degree-10 vehicular graphs: ~1024 at 100k
    nodes; RCM measured no tighter than BFS here).

    dtype: storage dtype of the A tiles. bf16 is exact for the common
    weight values (1.0 and small integers) and halves the dominant
    A-streaming traffic vs f32; int8 halves it AGAIN for graphs whose
    accumulated edge weights are integers in [-127, 127] (e.g. unweighted
    multigraphs — validated here, raises otherwise; the kernel converts
    tiles to bf16 in VMEM). Pass float32 for arbitrary f32 weights.
    """
    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    weights = np.asarray(graph.weights)
    n = graph.num_nodes
    e = senders.shape[0]
    assert r_block % 8 == 0, "r_block must be a multiple of the sublane tile"
    num_blocks = max(1, -(-n // r_block))
    n_padded = num_blocks * r_block

    block_of = receivers // r_block
    # per-block sender window start: min sender, clamped so the window fits
    w_start = np.zeros(num_blocks, np.int64)
    mins = np.full(num_blocks, np.iinfo(np.int64).max)
    maxs = np.full(num_blocks, -1)
    np.minimum.at(mins, block_of, senders)
    np.maximum.at(maxs, block_of, senders)
    have = maxs >= 0
    # starts are aligned DOWN to the TPU sublane tile (8 rows) so the
    # kernel's dynamic-start window DMA has a provably tiled offset; the
    # alignment slack (up to 7 rows) must also fit in the window
    mins_aligned = (np.where(have, mins, 0) // 8) * 8
    span = np.where(have, maxs - mins_aligned + 1, 0)
    if window is None:
        window = int(max(128, -(-int(span.max(initial=1)) // 128) * 128))
    assert window % 8 == 0, "window must be a multiple of the sublane tile"
    if span.max(initial=0) > window:
        bad = int(np.argmax(span))
        raise ValueError(
            f"sender span {int(span[bad])} of receiver block {bad} exceeds "
            f"window {window}; BFS-reorder the graph (graph.reorder_nodes) "
            "or raise `window`")
    w_start[have] = mins_aligned[have]
    # Clamp window starts so [start, start+window) stays inside the PADDED
    # feature table (the kernel pads h to max(n_padded, window) rows).
    # Clamping against the raw n (pre round-3) could push a tail block's
    # start below its aligned min sender when n % 8 != 0, breaking the
    # span<=window invariant (advisor finding, n=1003 repro). n_padded and
    # window are both 8-aligned, so the clamp value needs no re-alignment
    # and s_local = sender - start < window is guaranteed: either
    # start = mins_aligned (validated span) or start = n_padded - window
    # with sender <= n-1 < n_padded.
    w_start = np.minimum(w_start, max(0, n_padded - window))

    # build A in block chunks: one [B, R, W] f32 buffer would be
    # N*W*4 bytes (18 GB at 1M nodes / W=4608); chunking keeps the f32
    # intermediate bounded and casts to the storage dtype as it goes
    np_dtype = jnp.dtype(dtype)    # ml_dtypes makes bfloat16 numpy-valid
    r_local = receivers - block_of * r_block
    s_local = senders - w_start[block_of]
    edge_order = np.argsort(block_of, kind="stable")
    block_counts = np.bincount(block_of, minlength=num_blocks)
    block_starts = np.concatenate([[0], np.cumsum(block_counts)])
    chunk_blocks = max(1, (1 << 28) // max(1, r_block * window * 4))
    a = np.zeros((num_blocks * r_block, window), np_dtype)
    for b0 in range(0, num_blocks, chunk_blocks):
        b1 = min(b0 + chunk_blocks, num_blocks)
        rows = edge_order[block_starts[b0]:block_starts[b1]]
        sub = np.zeros((b1 - b0, r_block, window), np.float32)
        np.add.at(sub, (block_of[rows] - b0, r_local[rows], s_local[rows]),
                  weights[rows])
        if jnp.dtype(dtype) == jnp.int8:
            if not (np.all(sub == np.round(sub))
                    and np.abs(sub).max(initial=0) <= 127):
                raise ValueError(
                    "int8 A tiles need integer accumulated weights in "
                    "[-127, 127]; use bf16/f32 for this graph")
        a[b0 * r_block:b1 * r_block] = sub.reshape(
            (b1 - b0) * r_block, window).astype(np_dtype)

    return WindowedDenseGraph(
        a_dense=jnp.asarray(a, dtype=dtype),
        w_start=jnp.asarray(w_start, jnp.int32),
        num_nodes=n, num_nodes_padded=n_padded, r_block=r_block,
        num_edges=e)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WindowedDenseTGraph:
    """Feature-major (transposed) dense-window layout for NARROW feature
    dims (round 5).

    The node-major windowed kernel DMAs [W, F] windows whose minor dim is
    lane-padded to 128: at the model's own F=16
    (ModelConfig.num_feedback, reference BS_brain.py:101-104) the window
    traffic is 8x real data, and in the HBM-streamed regime (>=500k
    nodes, feature table beyond VMEM) F=16 measured exactly as slow as
    F=128 (docs/RESULTS.md round-5 narrow-F section). Here features are
    stored FEATURE-MAJOR [F_pad, N_pad] so a window slice [F_pad, W] is
    all real data on the (128-tiled) lane axis, and the A tiles are
    stored transposed [W, R] per block so the local matmul is
    h_win [F, W] @ A_t [W, R] -> out [F, R]. Window starts are 128-
    aligned (lane-dim dynamic slicing requires it), which widens W by at
    most 128 rows vs the node-major layout's 8-aligned starts.
    """

    # [B*W, R]: transposed tile of block b occupies rows [b*W, (b+1)*W).
    a_dense_t: jax.Array
    w_start: jax.Array      # [B] int32 window starts, 128-aligned
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    num_nodes_padded: int = dataclasses.field(metadata=dict(static=True))
    r_block: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_blocks(self) -> int:
        return int(self.w_start.shape[0])

    @property
    def window(self) -> int:
        return int(self.a_dense_t.shape[0]) // self.num_blocks


def window_dense_t(graph: COOGraph, r_block: int = 256,
                   window: Optional[int] = None,
                   dtype=jnp.bfloat16) -> WindowedDenseTGraph:
    """Host-side preprocessing into the feature-major windowed layout
    (`ops.spmm.spmm_windowed_t`). Same contract as `window_dense` but
    with 128-aligned window starts and per-block TRANSPOSED [W, R] A
    tiles. Use for narrow feature dims (F <= ~32) at HBM-streamed node
    counts; `window_dense` remains the layout for F >= 128.
    """
    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    weights = np.asarray(graph.weights)
    n = graph.num_nodes
    e = senders.shape[0]
    assert r_block % 8 == 0, "r_block must be a multiple of the sublane tile"
    num_blocks = max(1, -(-n // r_block))
    n_padded = num_blocks * r_block

    block_of = receivers // r_block
    w_start = np.zeros(num_blocks, np.int64)
    mins = np.full(num_blocks, np.iinfo(np.int64).max)
    maxs = np.full(num_blocks, -1)
    np.minimum.at(mins, block_of, senders)
    np.maximum.at(maxs, block_of, senders)
    have = maxs >= 0
    # starts aligned DOWN to the LANE tile (128): the kernel's window DMA
    # slices the lane axis, whose dynamic offset must be 128-aligned
    mins_aligned = (np.where(have, mins, 0) // 128) * 128
    span = np.where(have, maxs - mins_aligned + 1, 0)
    if window is None:
        window = int(max(128, -(-int(span.max(initial=1)) // 128) * 128))
    assert window % 128 == 0, "window must be a multiple of the lane tile"
    if span.max(initial=0) > window:
        bad = int(np.argmax(span))
        raise ValueError(
            f"sender span {int(span[bad])} of receiver block {bad} exceeds "
            f"window {window}; BFS-reorder the graph (graph.reorder_nodes) "
            "or raise `window`")
    w_start[have] = mins_aligned[have]
    # keep [start, start+window) inside the padded-to-128 feature table
    # (the kernel pads the node axis to a multiple of 128)
    n_lane_pad = -(-max(n_padded, window) // 128) * 128
    w_start = np.minimum(w_start, max(0, n_lane_pad - window))

    np_dtype = jnp.dtype(dtype)
    r_local = receivers - block_of * r_block
    s_local = senders - w_start[block_of]
    edge_order = np.argsort(block_of, kind="stable")
    block_counts = np.bincount(block_of, minlength=num_blocks)
    block_starts = np.concatenate([[0], np.cumsum(block_counts)])
    chunk_blocks = max(1, (1 << 28) // max(1, r_block * window * 4))
    a = np.zeros((num_blocks * window, r_block), np_dtype)
    for b0 in range(0, num_blocks, chunk_blocks):
        b1 = min(b0 + chunk_blocks, num_blocks)
        rows = edge_order[block_starts[b0]:block_starts[b1]]
        sub = np.zeros((b1 - b0, window, r_block), np.float32)
        np.add.at(sub, (block_of[rows] - b0, s_local[rows], r_local[rows]),
                  weights[rows])
        if jnp.dtype(dtype) == jnp.int8:
            if not (np.all(sub == np.round(sub))
                    and np.abs(sub).max(initial=0) <= 127):
                raise ValueError(
                    "int8 A tiles need integer accumulated weights in "
                    "[-127, 127]; use bf16/f32 for this graph")
        a[b0 * window:b1 * window] = sub.reshape(
            (b1 - b0) * window, r_block).astype(np_dtype)

    return WindowedDenseTGraph(
        a_dense_t=jnp.asarray(a, dtype=dtype),
        w_start=jnp.asarray(w_start, jnp.int32),
        num_nodes=n, num_nodes_padded=n_padded, r_block=r_block,
        num_edges=e)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BucketedWindowedGraph:
    """Variable-width windowed layout (round 4): receiver blocks are
    grouped into K width buckets and each bucket stores its A tiles at its
    OWN width, instead of padding every block to the widest block's span.

    On the 100k-node vehicular-geometric graph the block spans range
    157..1029 (median 790) while the uniform layout pays W=1152
    everywhere; bucketing to 3 widths cuts the A + h-window traffic — the
    ~82% of the kernel's bytes that scale with W — to ~0.74x
    (`benchmarks/roofline_bench.py` round-4 table).

    Kernel contract (`ops.spmm.spmm_windowed` dispatches on this type):
    ONE pallas_call whose grid walks the blocks in NATURAL (ascending
    w_start) order — a first bucket-major design lost ~25% of sustained
    bandwidth to the out-of-order window DMAs it caused. The per-step
    bucket is the prefetched `bucket_of` vector (dynamic pl.when branch,
    like the experimental paged kernel's first_flags); per-bucket A arrays are
    auto-pipelined through BlockSpecs whose index maps read the prefetched
    `a_idx` running counters (held CONSTANT while foreign buckets run, so
    Pallas's changed-index check skips those fetches). Outputs land at
    block index = grid index: no permutation anywhere.
    """

    a_parts: tuple          # K arrays [nk * r_block, W_k], natural order
    w_start: jax.Array      # [NB] int32 window starts, natural block order
    bucket_of: jax.Array    # [NB] int32 bucket id per block
    a_idx: tuple            # K arrays [NB] int32 clamped running indices
    block_ids: tuple        # K arrays [nk] int32 member blocks per bucket
    widths: tuple = dataclasses.field(metadata=dict(static=True))
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    num_nodes_padded: int = dataclasses.field(metadata=dict(static=True))
    r_block: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_blocks(self) -> int:
        return int(self.w_start.shape[0])


def _choose_bucket_widths(block_widths: np.ndarray, max_buckets: int
                          ) -> list:
    """Exact DP: pick <= max_buckets cover widths (from the distinct
    block widths, always including the max) minimizing total assigned
    width. O(C^2 K) over C distinct widths — C is small (W/128 classes)."""
    classes, counts = np.unique(block_widths, return_counts=True)
    c = classes.shape[0]
    k_max = min(max_buckets, c)
    inf = float("inf")
    # cost[j0][j1] = cost of covering classes (j0..j1] with width classes[j1]
    pre = np.concatenate([[0], np.cumsum(counts)])
    cost = np.full((c + 1, c), inf)
    for j1 in range(c):
        for j0 in range(-1, j1 + 1):
            cost[j0 + 1][j1] = float(classes[j1]) * (pre[j1 + 1] - pre[j0 + 1])
    dp = np.full((c + 1, k_max + 1), inf)
    choice = np.zeros((c + 1, k_max + 1), np.int64)
    dp[0, 0] = 0.0
    for j in range(1, c + 1):
        for k in range(1, k_max + 1):
            for j0 in range(j):
                v = dp[j0, k - 1] + cost[j0][j - 1]
                if v < dp[j, k]:
                    dp[j, k] = v
                    choice[j, k] = j0
    k_best = int(np.argmin(dp[c, 1:])) + 1
    cuts = []
    j = c
    for k in range(k_best, 0, -1):
        cuts.append(int(classes[j - 1]))
        j = int(choice[j, k])
    return sorted(cuts)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BucketedWindowedTGraph:
    """Variable-width FEATURE-MAJOR windowed layout (round 5): the
    bucketed width classes of `BucketedWindowedGraph` with the
    transposed [W_k, R] tiles and 128-aligned window starts of
    `WindowedDenseTGraph`. At 1M nodes / F=16 the uniform feature-major
    layout pays the WIDEST block's span (W_t = 4736) in the dominant A
    stream; bucketing cuts the W-proportional bytes to the assigned
    widths' total (~0.75x). Kernel: `ops.spmm.spmm_windowed_t`."""

    a_parts: tuple          # K arrays [nk * W_k, r_block], natural order
    w_start: jax.Array      # [NB] int32 window starts (128-aligned)
    bucket_of: jax.Array    # [NB] int32 bucket id per block
    a_idx: tuple            # K arrays [NB] int32 clamped running indices
    block_ids: tuple        # K arrays [nk] int32 member blocks per bucket
    widths: tuple = dataclasses.field(metadata=dict(static=True))
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    num_nodes_padded: int = dataclasses.field(metadata=dict(static=True))
    r_block: int = dataclasses.field(metadata=dict(static=True))
    num_edges: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_blocks(self) -> int:
        return int(self.w_start.shape[0])


def window_dense_bucketed_t(graph: COOGraph, r_block: int = 256,
                            max_buckets: int = 3,
                            dtype=jnp.bfloat16) -> BucketedWindowedTGraph:
    """Host-side preprocessing into the bucketed FEATURE-MAJOR layout:
    `window_dense_bucketed` semantics with 128-aligned starts (the
    feature-major kernel slices the lane axis) and transposed tiles."""
    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    weights = np.asarray(graph.weights)
    n = graph.num_nodes
    e = senders.shape[0]
    assert r_block % 8 == 0
    num_blocks = max(1, -(-n // r_block))
    n_padded = num_blocks * r_block
    n_lane_pad = -(-n_padded // 128) * 128
    np_dtype = jnp.dtype(dtype)

    block_of = receivers // r_block
    mins = np.full(num_blocks, np.iinfo(np.int64).max)
    maxs = np.full(num_blocks, -1)
    np.minimum.at(mins, block_of, senders)
    np.maximum.at(maxs, block_of, senders)
    have = maxs >= 0
    mins_aligned = (np.where(have, mins, 0) // 128) * 128
    span = np.where(have, maxs - mins_aligned + 1, 1)
    w_block = np.maximum(128, -(-span // 128) * 128)

    widths = _choose_bucket_widths(w_block, max_buckets)
    k_count = len(widths)
    bucket_of = np.searchsorted(np.asarray(widths), w_block)
    w_assigned = np.asarray(widths)[bucket_of]
    # keep [start, start+w) inside the lane-padded table; both bounds
    # are 128-aligned so the clamp preserves alignment
    starts = np.minimum(mins_aligned,
                        np.maximum(0, n_lane_pad - w_assigned))

    a_parts = []
    a_idx = []
    block_ids = []
    r_local = receivers - block_of * r_block
    s_local = senders - starts[block_of]
    assert s_local.min(initial=0) >= 0
    local_of_block = np.zeros(num_blocks, np.int64)
    for k in range(k_count):
        members = np.nonzero(bucket_of == k)[0]
        local_of_block[members] = np.arange(members.shape[0])
        block_ids.append(jnp.asarray(members.astype(np.int32)))
    for k in range(k_count):
        members = np.asarray(block_ids[k])
        nk = members.shape[0]
        wk = int(widths[k])
        a = np.zeros((max(nk, 1) * wk, r_block), np.float32)
        m = bucket_of[block_of] == k
        rows = local_of_block[block_of[m]] * wk + s_local[m]
        np.add.at(a, (rows, r_local[m]), weights[m])
        if np_dtype == jnp.int8:
            if not (np.all(a == np.round(a))
                    and np.abs(a).max(initial=0) <= 127):
                raise ValueError(
                    "int8 A tiles need integer accumulated weights in "
                    "[-127, 127]; use bf16/f32 for this graph")
        a_parts.append(jnp.asarray(a.astype(np_dtype)))
        running = np.cumsum(bucket_of == k) - 1
        a_idx.append(jnp.asarray(
            np.clip(running, 0, max(nk - 1, 0)).astype(np.int32)))

    return BucketedWindowedTGraph(
        a_parts=tuple(a_parts),
        w_start=jnp.asarray(starts.astype(np.int32)),
        bucket_of=jnp.asarray(bucket_of.astype(np.int32)),
        a_idx=tuple(a_idx), block_ids=tuple(block_ids),
        widths=tuple(int(x) for x in widths),
        num_nodes=n, num_nodes_padded=n_padded, r_block=r_block,
        num_edges=e)


def window_dense_bucketed(graph: COOGraph, r_block: int = 256,
                          max_buckets: int = 3,
                          dtype=jnp.bfloat16) -> BucketedWindowedGraph:
    """Host-side preprocessing into the variable-width windowed layout.
    Same invariants as `window_dense` (BFS-reorder first; int8 validates
    accumulated integer weights), with per-block window widths bucketed
    into <= max_buckets classes chosen by exact DP over the block-width
    histogram."""
    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    weights = np.asarray(graph.weights)
    n = graph.num_nodes
    e = senders.shape[0]
    assert r_block % 8 == 0
    num_blocks = max(1, -(-n // r_block))
    n_padded = num_blocks * r_block
    np_dtype = jnp.dtype(dtype)

    block_of = receivers // r_block
    mins = np.full(num_blocks, np.iinfo(np.int64).max)
    maxs = np.full(num_blocks, -1)
    np.minimum.at(mins, block_of, senders)
    np.maximum.at(maxs, block_of, senders)
    have = maxs >= 0
    mins_aligned = (np.where(have, mins, 0) // 8) * 8
    span = np.where(have, maxs - mins_aligned + 1, 1)
    w_block = np.maximum(128, -(-span // 128) * 128)

    widths = _choose_bucket_widths(w_block, max_buckets)
    k_count = len(widths)
    bucket_of = np.searchsorted(np.asarray(widths), w_block)
    w_assigned = np.asarray(widths)[bucket_of]
    starts = np.minimum(mins_aligned,
                        np.maximum(0, n_padded - w_assigned))

    # natural block order everywhere; per-bucket A arrays hold each
    # bucket's member blocks in that same order
    a_parts = []
    a_idx = []
    block_ids = []
    r_local = receivers - block_of * r_block
    s_local = senders - starts[block_of]
    assert s_local.min(initial=0) >= 0
    local_of_block = np.zeros(num_blocks, np.int64)
    for k in range(k_count):
        members = np.nonzero(bucket_of == k)[0]
        local_of_block[members] = np.arange(members.shape[0])
        block_ids.append(jnp.asarray(members.astype(np.int32)))
    for k in range(k_count):
        members = np.asarray(block_ids[k])
        nk = members.shape[0]
        wk = int(widths[k])
        a = np.zeros((max(nk, 1) * r_block, wk), np.float32)
        m = bucket_of[block_of] == k
        rows = local_of_block[block_of[m]] * r_block + r_local[m]
        np.add.at(a, (rows, s_local[m]), weights[m])
        if np_dtype == jnp.int8:
            if not (np.all(a == np.round(a))
                    and np.abs(a).max(initial=0) <= 127):
                raise ValueError(
                    "int8 A tiles need integer accumulated weights in "
                    "[-127, 127]; use bf16/f32 for this graph")
        a_parts.append(jnp.asarray(a.astype(np_dtype)))
        # running index per grid step, held constant while other buckets
        # run (unchanged index => Pallas skips the fetch)
        running = np.cumsum(bucket_of == k) - 1
        a_idx.append(jnp.asarray(
            np.clip(running, 0, max(nk - 1, 0)).astype(np.int32)))

    return BucketedWindowedGraph(
        a_parts=tuple(a_parts),
        w_start=jnp.asarray(starts.astype(np.int32)),
        bucket_of=jnp.asarray(bucket_of.astype(np.int32)),
        a_idx=tuple(a_idx), block_ids=tuple(block_ids),
        widths=tuple(int(x) for x in widths),
        num_nodes=n, num_nodes_padded=n_padded, r_block=r_block,
        num_edges=e)


def window_edge_slots(graph: COOGraph, wd: WindowedDenseGraph
                      ) -> Tuple[jax.Array, jax.Array]:
    """Dense-A slot (row, col) per COO edge: row = global padded receiver
    row, col = sender - w_start[block].

    Host-side O(E) preprocessing for the learned-edge-weight windowed path
    (`ops.spmm.make_weighted_spmm_windowed`): per-edge weights scatter-add
    into the dense A through these slots (duplicate edges share a slot and
    accumulate, matching `window_dense`'s own build), and per-edge weight
    grads gather back out of the dense SDDMM result through them. Kept as
    an index pair, not a flat offset — row*W overflows int32 at config-5
    scale (1M nodes x W=4608).
    """
    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    w = wd.window
    r_block = wd.r_block
    block_of = receivers // r_block
    w_start = np.asarray(wd.w_start).astype(np.int64)
    s_local = senders - w_start[block_of]
    if s_local.min(initial=0) < 0 or s_local.max(initial=0) >= w:
        raise ValueError("edge outside its block's window — the layout was "
                         "built from a different graph/ordering")
    rows = block_of.astype(np.int64) * r_block + (receivers % r_block)
    return (jnp.asarray(rows, jnp.int32), jnp.asarray(s_local, jnp.int32))


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
