"""Multi-chip edge-partitioned aggregation with ring halo exchange.

The sequence-parallel analog for graphs (SURVEY.md §2: "graph partitioning is
the CP analog"): nodes are row-partitioned across the mesh, each device owns
the edges that *terminate* in its node range (receiver-partitioned, so the
output never moves), and sender features flow around the ring — at step s,
device d holds feature chunk (d+s) mod D and aggregates exactly the edges
whose senders live in that chunk, then `ppermute`s the chunk onward. The
aggregation of step s overlaps with the permute of step s+1 (XLA async
collective permute over ICI), which is ring-attention's structure applied to
neighborhood aggregation (BASELINE.json north star).

Two modes:
  * `make_partitioned_spmm`: simplest DP form — features replicated, edge
    shards local, partial outputs psum'ed. One allreduce, no ring.
  * `make_ring_spmm`: features sharded, ring halo exchange as above.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gnnra_tpu import graph as graph_lib
from gnnra_tpu.ops import spmm as spmm_lib


@dataclasses.dataclass(frozen=True)
class RingPartition:
    """Preprocessed layout for make_ring_spmm.

    Arrays carry [D, D, ...]: first axis = owning device (receiver chunk),
    second = sender chunk (indexed by ring step). Edges are receiver-blocked
    within their (device, chunk) bucket; sender/receiver ids are local to
    their chunks.
    """

    senders: jax.Array      # [D, D, B, E] int32 (sender-local)
    recv_local: jax.Array   # [D, D, B, E] int32
    weights: jax.Array      # [D, D, B, E] f32
    num_devices: int
    nodes_per_device: int   # padded chunk size (multiple of r_block)
    r_block: int
    num_nodes: int          # original (unpadded) node count


def partition_for_ring(graph: graph_lib.COOGraph, num_devices: int,
                       r_block: int = 128) -> RingPartition:
    """Host-side preprocessing: bucket edges by (receiver chunk, sender
    chunk), then receiver-block each bucket with one uniform edge budget."""
    n = graph.num_nodes
    per = -(-n // num_devices)
    per = -(-per // r_block) * r_block          # chunk multiple of r_block
    senders = np.asarray(graph.senders)
    receivers = np.asarray(graph.receivers)
    weights = np.asarray(graph.weights)

    buckets: List[List[graph_lib.COOGraph]] = []
    blocked = [[None] * num_devices for _ in range(num_devices)]
    b_max, e_max = 1, 8
    for d in range(num_devices):
        row = []
        for o in range(num_devices):
            mask = ((receivers // per == d) & (senders // per == o))
            sub = graph_lib.COOGraph(
                senders=jnp.asarray(senders[mask] - o * per, jnp.int32),
                receivers=jnp.asarray(receivers[mask] - d * per, jnp.int32),
                weights=jnp.asarray(weights[mask], jnp.float32),
                num_nodes=per)
            row.append(sub)
        buckets.append(row)
    # uniform blocking so buckets stack: same B and E everywhere
    for d in range(num_devices):
        for o in range(num_devices):
            bl = graph_lib.block_by_receiver(buckets[d][o], r_block=r_block)
            blocked[d][o] = bl
            b_max = max(b_max, bl.num_blocks)
            e_max = max(e_max, bl.e_block)

    def pad(bl: graph_lib.BlockedGraph):
        def pad_arr(x, fill):
            out = np.full((b_max, e_max), fill, np.asarray(x).dtype)
            out[:x.shape[0], :x.shape[1]] = np.asarray(x)
            return out
        return (pad_arr(bl.senders, 0), pad_arr(bl.recv_local, 0),
                pad_arr(bl.weights, 0.0))

    s_all = np.zeros((num_devices, num_devices, b_max, e_max), np.int32)
    r_all = np.zeros((num_devices, num_devices, b_max, e_max), np.int32)
    w_all = np.zeros((num_devices, num_devices, b_max, e_max), np.float32)
    for d in range(num_devices):
        for o in range(num_devices):
            s_all[d, o], r_all[d, o], w_all[d, o] = pad(blocked[d][o])

    return RingPartition(senders=jnp.asarray(s_all),
                         recv_local=jnp.asarray(r_all),
                         weights=jnp.asarray(w_all),
                         num_devices=num_devices, nodes_per_device=per,
                         r_block=r_block, num_nodes=n)


def _local_blocked_spmm(h_chunk, senders, recv_local, weights, r_block,
                        impl):
    """SpMM of one (device, chunk) bucket against a feature chunk."""
    bl = graph_lib.BlockedGraph(
        senders=senders, recv_local=recv_local, weights=weights,
        edge_ids=jnp.zeros_like(senders),
        num_nodes=senders.shape[0] * r_block,
        num_nodes_padded=senders.shape[0] * r_block,
        r_block=r_block, num_edges=0)
    return spmm_lib.spmm_blocked(h_chunk, bl, impl=impl)


def make_ring_spmm(mesh: Mesh, part: RingPartition, feature_dim: int,
                   axis: str = "data", impl: str = "jnp"):
    """Build jitted ring SpMM: h [N_padded, F] sharded by rows ->
    out [N_padded, F] sharded by rows.

    N_padded = num_devices * nodes_per_device; callers pad/crop.
    """
    d_count = part.num_devices
    per = part.nodes_per_device

    def body(h_local, senders, recv_local, weights):
        # local views: h_local [per, F]; senders [1, D, B, E] -> [D, B, E]
        senders = senders[0]
        recv_local = recv_local[0]
        weights = weights[0]
        my = jax.lax.axis_index(axis)
        out = jnp.zeros((per, h_local.shape[-1]), h_local.dtype)
        buf = h_local
        perm = [(j, (j - 1) % d_count) for j in range(d_count)]
        for s in range(d_count):
            chunk_id = (my + s) % d_count
            sel = lambda arr: jnp.take(arr, chunk_id, axis=0)
            partial = _local_blocked_spmm(
                buf, sel(senders), sel(recv_local), sel(weights),
                part.r_block, impl)
            out = out + partial
            if s < d_count - 1:
                # send current chunk to the left neighbor; the permute of
                # the next chunk overlaps with this step's aggregation
                buf = jax.lax.ppermute(buf, axis, perm)
        return out

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        # pallas_call inside shard_map: the kernel's out_shape carries no
        # varying-mesh-axes annotation, so opt out of the vma checker
        check_vma=False)

    def run(h):
        return mapped(h, part.senders, part.recv_local, part.weights)

    return jax.jit(run)


def make_partitioned_spmm(mesh: Mesh, shards, num_nodes: int,
                          axis: str = "data", impl: str = "jnp"):
    """Replicated-feature edge-parallel SpMM: each device aggregates its own
    edge shard, partial outputs are psum'ed (one allreduce over ICI)."""
    senders = jnp.stack([b.senders for b in shards])
    recv_local = jnp.stack([b.recv_local for b in shards])
    weights = jnp.stack([b.weights for b in shards])
    r_block = shards[0].r_block
    n_padded = shards[0].num_nodes_padded

    def body(h, s, r, w):
        partial = _local_blocked_spmm(h, s[0], r[0], w[0], r_block, impl)
        return jax.lax.psum(partial, axis)[None]

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=P(axis))

    def run(h):
        # every device returns the same full result; take shard 0's copy
        out = mapped(h, senders, recv_local, weights)
        return out[0, :num_nodes]

    return jax.jit(run)
