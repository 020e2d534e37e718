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
    explicit e_block.
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
