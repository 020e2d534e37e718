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
                       r_block: int = 128,
                       use_native: bool = True) -> RingPartition:
    """Host-side preprocessing: bucket edges by (receiver chunk, sender
    chunk, receiver block) and fill the stacked [D, D, B, E] layout.

    One O(E) counting pass + one O(E) stable fill pass — in the native
    library when available (blocking.cpp count_ring_cells/fill_ring_cells),
    else two vectorized NumPy passes. (The round-2 implementation built a
    full-edge boolean mask per (device, chunk) pair — O(E*D^2), minutes at
    config-5 scale; this preprocesses 10M edges / 8 devices in ~1 s.)
    """
    n = graph.num_nodes
    per = -(-n // num_devices)
    per = -(-per // r_block) * r_block          # chunk multiple of r_block
    senders = np.ascontiguousarray(np.asarray(graph.senders), np.int32)
    receivers = np.ascontiguousarray(np.asarray(graph.receivers), np.int32)
    weights = np.ascontiguousarray(np.asarray(graph.weights), np.float32)
    e = senders.shape[0]
    d_count = num_devices
    blocks = per // r_block

    lib = None
    if use_native:
        from gnnra_tpu.native import get_lib
        lib = get_lib()

    import ctypes
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)

    if lib is not None:
        counts = np.zeros(d_count * d_count * blocks, np.int64)
        lib.count_ring_cells(
            senders.ctypes.data_as(i32p), receivers.ctypes.data_as(i32p),
            e, per, d_count, r_block, counts.ctypes.data_as(i64p))
        e_max = max(8, int(-(-int(counts.max(initial=1)) // 8) * 8))
        s_all = np.zeros((d_count, d_count, blocks, e_max), np.int32)
        r_all = np.zeros((d_count, d_count, blocks, e_max), np.int32)
        w_all = np.zeros((d_count, d_count, blocks, e_max), np.float32)
        rc = lib.fill_ring_cells(
            senders.ctypes.data_as(i32p), receivers.ctypes.data_as(i32p),
            weights.ctypes.data_as(f32p), e, per, d_count, r_block, e_max,
            s_all.ctypes.data_as(i32p), r_all.ctypes.data_as(i32p),
            w_all.ctypes.data_as(f32p))
        assert rc == 0, "native ring fill reported cell overflow"
    else:
        d_of = receivers // per
        o_of = senders // per
        b_of = (receivers - d_of * per) // r_block
        cell = (d_of.astype(np.int64) * d_count + o_of) * blocks + b_of
        n_cells = d_count * d_count * blocks
        counts = np.bincount(cell, minlength=n_cells)
        e_max = max(8, int(-(-int(counts.max(initial=1)) // 8) * 8))
        order = np.argsort(cell, kind="stable")
        sorted_cells = cell[order]
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        slots = np.arange(e, dtype=np.int64) - starts[sorted_cells]
        s_all = np.zeros((n_cells, e_max), np.int32)
        r_all = np.zeros((n_cells, e_max), np.int32)
        w_all = np.zeros((n_cells, e_max), np.float32)
        s_all[sorted_cells, slots] = (senders - o_of.astype(np.int32) * per
                                      )[order]
        r_all[sorted_cells, slots] = (receivers - d_of.astype(np.int32) * per
                                      - b_of.astype(np.int32) * r_block
                                      )[order]
        w_all[sorted_cells, slots] = weights[order]
        shape = (d_count, d_count, blocks, e_max)
        s_all = s_all.reshape(shape)
        r_all = r_all.reshape(shape)
        w_all = w_all.reshape(shape)

    return RingPartition(senders=jnp.asarray(s_all),
                         recv_local=jnp.asarray(r_all),
                         weights=jnp.asarray(w_all),
                         num_devices=d_count, nodes_per_device=per,
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


def make_ring_spmm_gspmd(mesh: Mesh, part: RingPartition,
                         axis: str = "data"):
    """Ring SpMM expressed in GSPMD (global arrays + sharding annotations)
    instead of shard_map.

    Measured on the TPU runtime in this environment, EVERY computation
    inside a shard_map body runs ~20x slower than the identical jit'd
    computation — even a trivial elementwise op streams at ~21 GB/s vs
    ~800 (docs/RESULTS.md, ring section). So the production ring path keeps
    the whole program in GSPMD-land:

      * the circulating feature buffer is [D, per, F] sharded on axis 0;
        `jnp.roll(buf, -1, axis=0)` IS the ring step — XLA lowers a roll
        along a sharded axis to a collective-permute over ICI;
      * each step's gather is a batch-sharded `vmap` gather (XLA partitions
        gathers with sharded operand batch dims locally, keeping its fast
        gather lowering — the shard_map manual-mode gather is ~45x slower);
      * the segment reduction is the one-hot einsum (XLA matmul, batch dim
        sharded; at r_block=256 it matches the Pallas kernel's speed on
        pre-gathered messages).

    h: [D*per, F] row-sharded; returns [D*per, F] row-sharded.
    """
    d_count = part.num_devices
    per = part.nodes_per_device
    r_block = part.r_block

    @jax.jit
    def run(h, senders, recv_local, weights):
        f = h.shape[-1]
        buf = h.reshape(d_count, per, f)
        out = jnp.zeros_like(buf)
        r_ids = jnp.arange(r_block)
        for s in range(d_count):
            idx = (jnp.arange(d_count) + s) % d_count      # chunk at step s
            sel = lambda arr: jnp.take_along_axis(
                arr, idx[:, None, None, None], axis=1)[:, 0]  # [D, B, E]
            snd = sel(senders)
            rcv = sel(recv_local)
            wgt = sel(weights)
            msgs = jax.vmap(lambda b, i: b[i])(buf, snd)   # [D, B, E, F]
            onehot = (rcv[..., None] == r_ids).astype(h.dtype)
            m = onehot * wgt[..., None].astype(h.dtype)
            # f32 inputs force the exact contraction: TPU DEFAULT precision
            # multiplies in bf16 (~1e-2 error, caught by the hardware
            # parity smoke); the ring is comm/HBM-bound so this is free
            precision = (jax.lax.Precision.HIGHEST
                         if h.dtype == jnp.float32 else None)
            partial = jnp.einsum("dber,dbef->dbrf", m, msgs,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
            out = out + partial.reshape(d_count, per, f).astype(h.dtype)
            if s < d_count - 1:
                # device d's next chunk comes from d+1: a roll along the
                # sharded axis = XLA collective-permute around the ring
                buf = jnp.roll(buf, shift=-1, axis=0)
        return out.reshape(d_count * per, f)

    from jax.sharding import NamedSharding
    sh_rows = NamedSharding(mesh, P(axis))

    def prepare():
        """Device-put the layout arrays once (row-sharded). Benchmarks MUST
        pass these to `call.run` as ARGUMENTS — wrapping `call` itself in
        another jit would embed them as HLO constants (the remote-compile
        HTTP 413 trap, docs/RESULTS.md)."""
        return jax.device_put((part.senders, part.recv_local, part.weights),
                              NamedSharding(mesh, P(axis)))

    def call(h):
        h = jax.device_put(h, sh_rows)
        return run(h, *prepare())

    call.run = run
    call.prepare = prepare
    return call


@dataclasses.dataclass(frozen=True)
class RingWindowedPartition:
    """Preprocessed layout for `make_ring_spmm_windowed_gspmd`: the GSPMD
    ring with the measured-fastest (windowed-dense) local stage.

    Per ring step s, device d aggregates the edges whose receivers live in
    its node chunk and whose senders live in chunk (d+s) mod D. On a
    BFS-ordered geometric graph partitioned contiguously, step 0 carries
    ~all edges with the same narrow sender windows as the single-chip
    windowed layout, and steps >0 carry only chunk-boundary edges — so the
    per-step stacked block lists are COMPACT (only blocks that actually
    have edges at that step, padded across devices to a uniform count).

    Fields are per-step tuples (shapes differ across steps):
      a_dense[s]:     [D, B_s * r_block, W_s] storage-dtype A tiles
      w_start[s]:     [D, B_s] int32 chunk-LOCAL window starts (8-aligned)
      block_rows[s]:  [D, B_s] int32 receiver-block index inside the
                      device's chunk (padding blocks -> 0 with zero A)

    Boundary-band metadata (round 5 — the halo the banded exchange moves
    instead of circulating full [per, F] chunks; see
    `make_banded_spmm_gspmd`). At step s > 0 the blocks of device d read
    only a narrow 8-aligned band of chunk (d+s) mod D:
      band_width[s]:  int, uniform band rows at step s (0 when the step
                      has no edges at all — the step is then SKIPPED by
                      the banded builders: no comm, no compute)
      band_start[s]:  [D] int32, start row (inside the SOURCE chunk) of
                      the band device d RECEIVES
      band_sent_start[s]: [D] int32 = band_start[(d - s) mod D]: start of
                      the band device d SLICES OUT of its own chunk to
                      send (pre-permuted so the slice is a batch-sharded
                      local gather)
      w_start_band[s]: [D, B_s] int32 BAND-local window starts
      step_edges[s]:  int, edge count assigned to step s
    """

    a_dense: tuple
    w_start: tuple
    block_rows: tuple
    num_devices: int
    nodes_per_device: int
    r_block: int
    num_nodes: int
    band_width: tuple = ()
    band_start: tuple = ()
    band_sent_start: tuple = ()
    w_start_band: tuple = ()
    step_edges: tuple = ()
    # feature-major per-step tiles ([D, B_s*W_s, R] transposed) for the
    # narrow-F windowed_t local stage; window/band starts 128-aligned
    feature_major: bool = False

    @property
    def window(self):
        return tuple(int(a.shape[-1]) for a in self.a_dense)

    @property
    def num_step_blocks(self):
        return tuple(int(ws.shape[-1]) for ws in self.w_start)

    def comm_bytes_per_device(self, feature_dim: int, itemsize: int
                              ) -> dict:
        """Per-device comm bytes for one aggregation: the full-chunk ring
        (D-1 hops of the whole [per, F] chunk) vs the banded exchange
        (one [band_width_s, F] slice per nonempty step s > 0)."""
        full = (self.num_devices - 1) * self.nodes_per_device \
            * feature_dim * itemsize
        banded = sum(bw * feature_dim * itemsize
                     for s, bw in enumerate(self.band_width)
                     if s > 0 and self.step_edges[s] > 0)
        return {"full_chunk_ring": full, "banded": banded,
                "ratio": (full / banded) if banded else float("inf")}


def partition_for_ring_windowed(graph: graph_lib.COOGraph,
                                num_devices: int, r_block: int = 256,
                                dtype=jnp.bfloat16,
                                feature_major: bool = False
                                ) -> RingWindowedPartition:
    """Host-side preprocessing of a BFS-ordered geometric graph into the
    ring x windowed layout (round-4 composition: the GSPMD ring's local
    stage was the one-hot einsum — random-topology machinery measured 3.1x
    slower than the windowed kernel on the domain's geometric topology).

    Requires the graph to already be BFS-ordered (`graph.reorder_nodes`);
    contiguous node chunks then keep each step's sender windows narrow.
    Reference anchors: the aggregation being scaled BS_brain.py:69-76,
    topology Environment.py:360-376.
    """
    import numpy as np

    n = graph.num_nodes
    d_count = num_devices
    per = -(-n // d_count)
    per = -(-per // r_block) * r_block
    senders = np.asarray(graph.senders).astype(np.int64)
    receivers = np.asarray(graph.receivers).astype(np.int64)
    weights = np.asarray(graph.weights).astype(np.float32)
    blocks_local = per // r_block
    np_dtype = jnp.dtype(dtype)

    # feature-major tiles need 128-aligned window/band starts (the
    # windowed_t kernel slices the LANE axis of the [F, rows] table)
    align = 128 if feature_major else 8
    d_of = receivers // per
    c_of = senders // per
    step_of = (c_of - d_of) % d_count
    r_local = receivers - d_of * per
    s_local_chunk = senders - c_of * per
    b_of = r_local // r_block

    a_steps, ws_steps, br_steps = [], [], []
    bw_steps, bs_steps, bss_steps, wsb_steps, ecnt_steps = [], [], [], [], []
    for s in range(d_count):
        m = step_of == s
        es, er_b, er_r = s_local_chunk[m], b_of[m], r_local[m] % r_block
        ed, ew = d_of[m], weights[m]
        # per-(device, local block) sender spans
        cell = ed * blocks_local + er_b
        mins = np.full(d_count * blocks_local, np.iinfo(np.int64).max)
        maxs = np.full(d_count * blocks_local, -1)
        np.minimum.at(mins, cell, es)
        np.maximum.at(maxs, cell, es)
        have = (maxs >= 0).reshape(d_count, blocks_local)
        mins_al = (np.where(maxs >= 0, mins, 0) // align) * align
        span = np.where(maxs >= 0, maxs - mins_al + 1, 0)
        w_s = int(max(128, -(-int(span.max(initial=1)) // 128) * 128))
        w_s = min(w_s, per)
        if span.max(initial=0) > w_s:
            raise ValueError(
                f"ring step {s}: sender span {int(span.max())} exceeds the "
                f"chunk-clamped window {w_s}; BFS-reorder the graph first")
        b_s = int(have.sum(axis=1).max(initial=1))
        b_s = max(1, b_s)

        # compact per-device block lists: block_rows[d, j] = j-th nonempty
        # local block of device d at this step (padding -> block 0, A = 0)
        block_rows = np.zeros((d_count, b_s), np.int64)
        slot_of_cell = np.full(d_count * blocks_local, -1, np.int64)
        for d in range(d_count):
            nz = np.nonzero(have[d])[0]
            block_rows[d, :nz.shape[0]] = nz
            slot_of_cell[d * blocks_local + nz] = d * b_s + np.arange(
                nz.shape[0])

        starts = np.minimum(mins_al, per - w_s).reshape(d_count,
                                                        blocks_local)
        w_start = np.take_along_axis(starts, block_rows, axis=1)

        slot = slot_of_cell[cell]
        col = es - starts[ed, er_b]
        if feature_major:
            a = np.zeros((d_count * b_s * w_s, r_block), np.float32)
            np.add.at(a, (slot * w_s + col, er_r), ew)
        else:
            a = np.zeros((d_count * b_s * r_block, w_s), np.float32)
            np.add.at(a, (slot * r_block + er_r, col), ew)
        if np_dtype == jnp.int8:
            if not (np.all(a == np.round(a)) and np.abs(a).max(initial=0)
                    <= 127):
                raise ValueError("int8 ring tiles need integer accumulated "
                                 "weights in [-127, 127]")
        a_steps.append(jnp.asarray(
            a.reshape(d_count, -1, w_s if not feature_major else r_block
                      ).astype(np_dtype)))
        ws_steps.append(jnp.asarray(w_start, jnp.int32))
        br_steps.append(jnp.asarray(block_rows, jnp.int32))

        # --- boundary-band metadata (banded halo exchange, round 5) ---
        # Per device d: the union of this step's real-block windows is
        # [need_start[d], need_end[d]); the band is that span padded to a
        # uniform (max-over-devices) 8-aligned width and clamped into the
        # source chunk. Devices with no real blocks at this step get a
        # zero-A band at 0 (they still join the collective — static
        # program — but contribute nothing).
        n_edges_s = int(m.sum())
        ecnt_steps.append(n_edges_s)
        have_dev = have.any(axis=1)                          # [D]
        w_real = np.where(have, starts, np.iinfo(np.int64).max)
        need_start = w_real.min(axis=1)                      # [D]
        w_end = np.where(have, starts + w_s, -1)
        need_end = w_end.max(axis=1)                         # [D]
        if n_edges_s == 0:
            bw = 0
            b_start = np.zeros(d_count, np.int64)
        elif s == 0:
            # the diagonal step reads the device's own RESIDENT chunk —
            # no band is sliced or exchanged, so keep window starts
            # chunk-local (band == chunk)
            bw = per
            b_start = np.zeros(d_count, np.int64)
        else:
            span_dev = np.where(have_dev, need_end - need_start, w_s)
            bw = int(-(-int(span_dev.max(initial=w_s)) // align) * align)
            bw = min(bw, per)
            b_start = np.where(have_dev,
                               np.clip(need_start, 0, per - bw), 0)
        bw_steps.append(bw)
        bs_steps.append(jnp.asarray(b_start, jnp.int32))
        # what device d sends = the band its (d - s) mod D neighbor needs
        sent = b_start[(np.arange(d_count) - s) % d_count]
        bss_steps.append(jnp.asarray(sent, jnp.int32))
        wsb = w_start - b_start[:, None].astype(w_start.dtype)
        # padding blocks may go negative (w_start of block 0 below the
        # band); their A is zero, so pin them into range
        wsb = np.clip(wsb, 0, max(0, bw - w_s))
        wsb_steps.append(jnp.asarray(wsb, jnp.int32))

    return RingWindowedPartition(
        a_dense=tuple(a_steps), w_start=tuple(ws_steps),
        block_rows=tuple(br_steps), num_devices=d_count,
        nodes_per_device=per, r_block=r_block, num_nodes=n,
        band_width=tuple(bw_steps), band_start=tuple(bs_steps),
        band_sent_start=tuple(bss_steps), w_start_band=tuple(wsb_steps),
        step_edges=tuple(ecnt_steps), feature_major=feature_major)


def make_ring_spmm_windowed_gspmd(mesh: Mesh, part: RingWindowedPartition,
                                  axis: str = "data"):
    """GSPMD ring SpMM whose local stage is the windowed-dense matmul.

    Same program structure as `make_ring_spmm_gspmd` (circulating [D, per,
    F] buffer sharded on the device axis; `jnp.roll` along it = XLA
    collective-permute over ICI), but each step's local aggregation is the
    dense-window einsum over that step's compact block list instead of the
    one-hot gather+einsum — the window "gather" is a batch-sharded
    take_along_axis of CONTIGUOUS rows (XLA keeps it local per device),
    the contraction is exactly MXU-shaped, and cross-chunk steps touch
    only the few boundary blocks that have edges.

    The Pallas windowed kernel itself cannot be used here: pallas_call
    under GSPMD requires shard_map, whose manual-mode computations run
    ~20x degraded on this runtime (docs/RESULTS.md platform findings), so
    the local stage is expressed in jnp for XLA to partition. h:
    [D*per, F] row-sharded; returns [D*per, F] row-sharded f32.
    """
    d_count = part.num_devices
    per = part.nodes_per_device
    r_block = part.r_block
    blocks_local = per // r_block
    assert not part.feature_major, (
        "full-chunk ring builders take node-major tiles; use the banded "
        "builders for feature_major partitions")

    @jax.jit
    def run(h, a_steps, ws_steps, br_steps):
        f = h.shape[-1]
        compute_dtype = h.dtype
        buf = h.reshape(d_count, per, f)
        out = jnp.zeros((d_count, blocks_local, r_block, f), jnp.float32)
        for s in range(d_count):
            a = a_steps[s]
            w_s = a.shape[-1]
            b_s = ws_steps[s].shape[-1]
            a3 = a.reshape(d_count, b_s, r_block, w_s)
            if a3.dtype == jnp.int8:
                a3 = a3.astype(jnp.bfloat16)
            a3 = a3.astype(compute_dtype)
            idx = ws_steps[s][:, :, None] + jnp.arange(w_s)[None, None, :]
            h_win = jax.vmap(lambda bd, ix: bd[ix])(buf, idx)  # [D,B,W,F]
            precision = (jax.lax.Precision.HIGHEST
                         if compute_dtype == jnp.float32 else None)
            partial = jnp.einsum("dbrw,dbwf->dbrf", a3, h_win,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
            out = jax.vmap(lambda o, bi, p: o.at[bi].add(p))(
                out, br_steps[s], partial)
            if s < d_count - 1:
                buf = jnp.roll(buf, shift=-1, axis=0)
        return out.reshape(d_count * per, f)

    from jax.sharding import NamedSharding
    sh_rows = NamedSharding(mesh, P(axis))

    def prepare():
        """Device-put the layout arrays once (row-sharded); pass to
        `call.run` as arguments in benchmark chains (see
        make_ring_spmm_gspmd.prepare)."""
        return (jax.device_put(part.a_dense, sh_rows),
                jax.device_put(part.w_start, sh_rows),
                jax.device_put(part.block_rows, sh_rows))

    def call(h):
        h = jax.device_put(h, sh_rows)
        return run(h, *prepare())

    call.run = run
    call.prepare = prepare
    return call


def make_banded_spmm_gspmd(mesh: Mesh, part: RingWindowedPartition,
                           axis: str = "data"):
    """Boundary-band halo exchange (round 5): the windowed GSPMD
    aggregation that ships ONLY the sender bands the receivers read,
    instead of circulating full [per, F] chunks.

    The round-4 ring moved (D-1) * per * F features per device while its
    steps > 0 touched only chunk-boundary blocks; on a BFS-ordered
    geometric topology the senders device d actually reads from chunk
    (d+s) mod D form a ~window-wide 8-aligned band (precomputed:
    `band_start`/`band_width`). Per nonempty step s > 0:

      1. each device SLICES the band its (d-s) mod D neighbor needs out
         of its own resident chunk (batch-sharded take_along_axis —
         local),
      2. ONE `jnp.roll(bands, -s, axis=0)` along the sharded device axis
         moves the [band_width_s, F] slices (XLA collective-permute over
         ICI — the only communication),
      3. the dense-window einsum runs against BAND-local window starts.

    Steps with zero edges are dropped from the program entirely (typical
    geometric partitions have edges only at s in {0, 1, D-1}), so comm
    per device is ~2 bands instead of D-1 full chunks — the
    `comm_bytes_per_device` table quantifies the cut (~100-600x at
    config-5 scale). The band slices of ALL steps are taken from the
    ORIGINAL resident chunk (never from a circulated buffer), so no step
    depends on a previous step's permute: XLA can overlap every exchange
    with the (dominant) step-0 local compute, and the zero-overlap floor
    no longer rides on that happening.

    Differentiable end to end (gather/roll/einsum/scatter-add — the
    cotangent of the band gather is the scatter back into the resident
    chunk, of the roll the reverse roll), so this is also the training
    aggregation (`sparse_spmd.make_sparse_spmd_train_step`).

    h: [D*per, F] row-sharded; returns [D*per, F] row-sharded f32.
    Reference anchors: aggregation BS_brain.py:69-76, topology
    Environment.py:360-376; BASELINE north star "exchanging boundary
    node features".
    """
    d_count = part.num_devices
    per = part.nodes_per_device
    r_block = part.r_block
    blocks_local = per // r_block
    assert part.band_width, (
        "partition lacks band metadata; re-run partition_for_ring_windowed")
    live = [s for s in range(d_count)
            if s == 0 or part.step_edges[s] > 0]

    @jax.jit
    def run(h, a_steps, wsb_steps, br_steps, sent_steps):
        f = h.shape[-1]
        compute_dtype = h.dtype
        buf = h.reshape(d_count, per, f)
        out = jnp.zeros((d_count, blocks_local, r_block, f), jnp.float32)
        for s in live:
            a = a_steps[s]
            b_s = wsb_steps[s].shape[-1]
            if part.feature_major:
                w_s = a.shape[1] // b_s
                a3 = a.reshape(d_count, b_s, w_s, r_block)
                spec = "dbwr,dbwf->dbrf"
            else:
                w_s = a.shape[-1]
                a3 = a.reshape(d_count, b_s, r_block, w_s)
                spec = "dbrw,dbwf->dbrf"
            if a3.dtype == jnp.int8:
                a3 = a3.astype(jnp.bfloat16)
            a3 = a3.astype(compute_dtype)
            if s == 0:
                band = buf                                   # no comm
            else:
                bw = part.band_width[s]
                idx_b = sent_steps[s][:, None] + jnp.arange(bw)[None, :]
                sent = jax.vmap(lambda bd, ix: bd[ix])(buf, idx_b)
                # roll along the sharded device axis: recv[d] =
                # sent[(d+s) % D] — a collective-permute of [bw, F] only
                band = jnp.roll(sent, shift=-s, axis=0)
            idx = wsb_steps[s][:, :, None] + jnp.arange(w_s)[None, None, :]
            h_win = jax.vmap(lambda bd, ix: bd[ix])(band, idx)  # [D,B,W,F]
            precision = (jax.lax.Precision.HIGHEST
                         if compute_dtype == jnp.float32 else None)
            partial = jnp.einsum(spec, a3, h_win,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
            out = jax.vmap(lambda o, bi, p: o.at[bi].add(p))(
                out, br_steps[s], partial)
        return out.reshape(d_count * per, f)

    from jax.sharding import NamedSharding
    sh_rows = NamedSharding(mesh, P(axis))

    def prepare():
        """Device-put the layout arrays once; pass to `call.run` as
        arguments (the HLO-constant / remote-compile trap)."""
        return (jax.device_put(part.a_dense, sh_rows),
                jax.device_put(part.w_start_band, sh_rows),
                jax.device_put(part.block_rows, sh_rows),
                jax.device_put(part.band_sent_start, sh_rows))

    def call(h):
        h = jax.device_put(h, sh_rows)
        return run(h, *prepare())

    call.run = run
    call.prepare = prepare
    call.live_steps = tuple(live)
    return call


def make_banded_spmm_pallas_gspmd(mesh: Mesh,
                                  part: RingWindowedPartition,
                                  axis: str = "data",
                                  impl: str = "pallas"):
    """Banded halo exchange with the PALLAS windowed kernel as the local
    stage, mounted under GSPMD via `jax.experimental.custom_partitioning`
    (full kernel speed — the round-4 unlock; shard_map compute is ~20x
    degraded on this runtime).

    Communication identical to `make_banded_spmm_gspmd`: per nonempty
    step s > 0, one collective-permute of the [band_width_s, F] sender
    bands; zero-edge steps are dropped from the program. The local stage
    chains through an accumulator operand (out comes back as an input to
    each step's custom_partitioning op), so the op's output sharding rule
    reuses the accumulator's dimensions — no fresh output factors needed.
    Forward only (the Pallas stage has no autodiff path); training uses
    the differentiable jnp banded builder.
    """
    from jax.experimental.custom_partitioning import custom_partitioning

    from gnnra_tpu.graph import WindowedDenseGraph, WindowedDenseTGraph
    from gnnra_tpu.ops import spmm as spmm_lib

    d_count = part.num_devices
    per = part.nodes_per_device
    r_block = part.r_block
    blocks_local = per // r_block
    assert part.band_width, (
        "partition lacks band metadata; re-run partition_for_ring_windowed")
    live = [s for s in range(d_count)
            if s == 0 or part.step_edges[s] > 0]

    def step_dims(s):
        b_s = int(part.w_start[s].shape[-1])
        if part.feature_major:
            w_s = int(part.a_dense[s].shape[1]) // b_s
        else:
            w_s = int(part.a_dense[s].shape[-1])
        return b_s, w_s

    def local_kernel(band, a_shard, wsb_shard, b_s):
        """One device's compact windowed SpMM for this step: node-major
        Pallas kernel, or the feature-major (windowed_t) kernel when the
        partition stores transposed tiles — the round-5 narrow-F path
        (2x the node-major kernel at the model's own F=16)."""
        if part.feature_major:
            wd_loc = WindowedDenseTGraph(
                a_dense_t=a_shard, w_start=wsb_shard,
                num_nodes=b_s * r_block, num_nodes_padded=b_s * r_block,
                r_block=r_block, num_edges=0)
            return spmm_lib.spmm_windowed_t(band, wd_loc, impl=impl,
                                            out_dtype=band.dtype)
        wd_loc = WindowedDenseGraph(
            a_dense=a_shard, w_start=wsb_shard, num_nodes=b_s * r_block,
            num_nodes_padded=b_s * r_block, r_block=r_block, num_edges=0)
        return spmm_lib.spmm_windowed(band, wd_loc, impl=impl,
                                      out_dtype=band.dtype)

    def global_einsum(band3, a, wsb, b_s, w_s):
        """Dense-window einsum with GLOBAL semantics — the shape source
        and XLA fallback body for both tile orientations."""
        d = band3.shape[0]
        if part.feature_major:
            a3 = a.reshape(d, b_s, w_s, r_block)
            spec = "dbwr,dbwf->dbrf"
        else:
            a3 = a.reshape(d, b_s, r_block, w_s)
            spec = "dbrw,dbwf->dbrf"
        if a3.dtype == jnp.int8:
            a3 = a3.astype(jnp.bfloat16)
        a3 = a3.astype(band3.dtype)
        idx = wsb[:, :, None] + jnp.arange(w_s)[None, None, :]
        h_win = jax.vmap(lambda bd, ix: bd[ix])(band3, idx)
        precision = (jax.lax.Precision.HIGHEST
                     if band3.dtype == jnp.float32 else None)
        return jnp.einsum(spec, a3, h_win,
                          preferred_element_type=jnp.float32,
                          precision=precision)          # [D, B, R, F] f32

    def make_step0():
        """Diagonal step: band == resident chunk, no accumulator operand.
        When the block list is the identity (every local block, in order
        — the common case for the diagonal step) the compact kernel
        output IS the chunk and no scatter is emitted at all."""
        b_s, w_s = step_dims(0)
        br_np = np.asarray(part.block_rows[0])
        identity = (b_s == blocks_local and
                    bool((br_np == np.arange(blocks_local)).all()))

        def shard_fn(buf3, a, wsb, br):
            buf = buf3[0]
            f = buf.shape[-1]
            compact = local_kernel(buf, a[0], wsb[0], b_s)
            if identity:
                return compact.reshape(1, per, f)
            out = jnp.zeros((blocks_local, r_block, f), buf.dtype)
            out = out.at[br[0]].add(compact.reshape(b_s, r_block, f))
            return out.reshape(1, per, f)

        def global_fn(buf3, a, wsb, br):
            d = buf3.shape[0]
            f = buf3.shape[-1]
            partial = global_einsum(buf3, a, wsb, b_s, w_s)
            out = jnp.zeros((d, blocks_local, r_block, f), jnp.float32)
            out = jax.vmap(lambda o, bi, p: o.at[bi].add(p))(
                out, br, partial)
            return out.reshape(d, per, f).astype(buf3.dtype)

        f_cp = custom_partitioning(global_fn)

        def partition(mesh_, arg_shapes, out_shape):
            return (mesh_, shard_fn,
                    jax.tree.map(lambda x: x.sharding, out_shape),
                    jax.tree.map(lambda x: x.sharding, arg_shapes))

        def infer_sharding(mesh_, arg_shapes, out_shape):
            return arg_shapes[0].sharding

        f_cp.def_partition(
            partition=partition,
            infer_sharding_from_operands=infer_sharding,
            sharding_rule="d i j, d k l, d m, d n -> d i j")
        return shard_fn if d_count == 1 else f_cp

    def make_step(s):
        b_s, w_s = step_dims(s)

        def shard_fn(out3, band3, a, wsb, br):
            """Per-SHARD lowering: this device's band through the Pallas
            windowed kernel on the step's compact block list, scatter-
            added into the accumulator chunk (a few boundary blocks)."""
            band = band3[0]
            f = band.shape[-1]
            compact = local_kernel(band, a[0], wsb[0], b_s)
            out = out3[0].reshape(blocks_local, r_block, f)
            out = out.at[br[0]].add(
                compact.reshape(b_s, r_block, f).astype(out.dtype))
            return out.reshape(1, per, f)

        def global_fn(out3, band3, a, wsb, br):
            """GLOBAL semantics (shape source + XLA's fallback): the
            dense-window einsum vmapped over the device axis."""
            d = band3.shape[0]
            f = band3.shape[-1]
            partial = global_einsum(band3, a, wsb, b_s, w_s)
            out = out3.reshape(d, blocks_local, r_block, f)
            out = jax.vmap(lambda o, bi, p: o.at[bi].add(
                p.astype(o.dtype)))(out, br, partial)
            return out.reshape(d, per, f)

        f_cp = custom_partitioning(global_fn)

        def partition(mesh_, arg_shapes, out_shape):
            return (mesh_, shard_fn,
                    jax.tree.map(lambda x: x.sharding, out_shape),
                    jax.tree.map(lambda x: x.sharding, arg_shapes))

        def infer_sharding(mesh_, arg_shapes, out_shape):
            return arg_shapes[0].sharding

        f_cp.def_partition(
            partition=partition,
            infer_sharding_from_operands=infer_sharding,
            # accumulator dims (d p j) flow through to the output
            sharding_rule="d p j, d i j, d k l, d m, d n -> d p j")
        if d_count == 1:
            # a 1-device mesh never takes the partition path; call the
            # shard lowering (the production local stage) directly
            return shard_fn
        return f_cp

    steps = {s: (make_step0() if s == 0 else make_step(s)) for s in live}

    from jax.sharding import NamedSharding
    sh_rows = NamedSharding(mesh, P(axis))

    @jax.jit
    def run(h, a_steps, wsb_steps, br_steps, sent_steps):
        f = h.shape[-1]
        constrain = lambda x: jax.lax.with_sharding_constraint(x, sh_rows)
        buf = constrain(h.reshape(d_count, per, f))
        # step 0 (always live) initializes the accumulator — no zeros
        # buffer, no scatter on the identity diagonal
        out = steps[0](buf, constrain(a_steps[0]),
                       constrain(wsb_steps[0]),
                       constrain(br_steps[0]))
        for s in live:
            if s == 0:
                continue
            bw = part.band_width[s]
            idx_b = sent_steps[s][:, None] + jnp.arange(bw)[None, :]
            sent = jax.vmap(lambda bd, ix: bd[ix])(buf, idx_b)
            band = constrain(jnp.roll(sent, shift=-s, axis=0))
            out = steps[s](constrain(out), band,
                           constrain(a_steps[s]),
                           constrain(wsb_steps[s]),
                           constrain(br_steps[s]))
        return out.reshape(d_count * per, f)

    def prepare():
        return (jax.device_put(part.a_dense, sh_rows),
                jax.device_put(part.w_start_band, sh_rows),
                jax.device_put(part.block_rows, sh_rows),
                jax.device_put(part.band_sent_start, sh_rows))

    def call(h):
        h = jax.device_put(h, sh_rows)
        return run(h, *prepare())

    call.run = run
    call.prepare = prepare
    call.live_steps = tuple(live)
    return call


def make_ring_spmm_windowed_pallas_gspmd(mesh: Mesh,
                                         part: RingWindowedPartition,
                                         axis: str = "data",
                                         impl: str = "pallas"):
    """GSPMD ring SpMM whose local stage is the PALLAS windowed kernel,
    mounted under GSPMD via `jax.experimental.custom_partitioning`.

    Round-4 finding: pallas_call under custom_partitioning runs at FULL
    kernel speed on this runtime (measured 3.561 vs 3.565 Gedges/s plain
    at 100k nodes) — unlike shard_map, whose manual-mode computations are
    ~20x degraded. That recovers the 8x the jnp-expressed windowed local
    stage loses (`make_ring_spmm_windowed_gspmd`, 0.34 vs 2.79 Gedges/s),
    so this is the production multi-chip path for geometric topologies.

    Per ring step, each device runs the compact-block windowed kernel on
    its [per, F] chunk against that step's [B_s*r, W_s] A tiles and
    scatter-adds the compact result into its output rows; the ring hop
    stays `jnp.roll` on the sharded buffer (collective-permute). Forward
    only (the Pallas local stage has no autodiff path); use the jnp ring
    when gradients through the ring itself are needed.
    """
    from jax.experimental.custom_partitioning import custom_partitioning

    from gnnra_tpu.graph import WindowedDenseGraph
    from gnnra_tpu.ops import spmm as spmm_lib

    d_count = part.num_devices
    per = part.nodes_per_device
    r_block = part.r_block
    blocks_local = per // r_block

    def make_step(s):
        import numpy as np

        b_s = int(part.w_start[s].shape[-1])
        w_s = int(part.a_dense[s].shape[-1])
        # the diagonal step (and any step whose block list is every local
        # block in order, on every device) needs no scatter: the compact
        # kernel output IS the chunk. Static host-side check.
        br_np = np.asarray(part.block_rows[s])
        identity = (b_s == blocks_local and
                    bool((br_np == np.arange(blocks_local)).all()))

        def shard_fn(buf3, a, ws, br):
            """Per-SHARD lowering: [1, per, F] chunk through the Pallas
            windowed kernel on this step's compact block list."""
            buf = buf3[0]
            wd_loc = WindowedDenseGraph(
                a_dense=a[0], w_start=ws[0], num_nodes=b_s * r_block,
                num_nodes_padded=b_s * r_block, r_block=r_block,
                num_edges=0)
            compact = spmm_lib.spmm_windowed(buf, wd_loc, impl=impl,
                                             out_dtype=buf.dtype)
            if identity:
                return compact.reshape(1, per, buf.shape[-1])
            out = jnp.zeros((blocks_local, r_block, buf.shape[-1]),
                            jnp.float32)
            out = out.at[br[0]].add(
                compact.reshape(b_s, r_block, -1).astype(jnp.float32))
            return out.reshape(1, per, buf.shape[-1]).astype(buf.dtype)

        def global_fn(buf3, a, ws, br):
            """GLOBAL semantics (defines shapes; also the fallback if XLA
            declines to partition): the dense-window einsum vmapped over
            the device axis — the same math as the jnp windowed ring."""
            d = buf3.shape[0]
            f = buf3.shape[-1]
            a3 = a.reshape(d, b_s, r_block, w_s)
            if a3.dtype == jnp.int8:
                a3 = a3.astype(jnp.bfloat16)
            a3 = a3.astype(buf3.dtype)
            idx = ws[:, :, None] + jnp.arange(w_s)[None, None, :]
            h_win = jax.vmap(lambda bd, ix: bd[ix])(buf3, idx)
            precision = (jax.lax.Precision.HIGHEST
                         if buf3.dtype == jnp.float32 else None)
            partial = jnp.einsum("dbrw,dbwf->dbrf", a3, h_win,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)
            out = jnp.zeros((d, blocks_local, r_block, f), jnp.float32)
            out = jax.vmap(lambda o, bi, p: o.at[bi].add(p))(
                out, br, partial)
            return out.reshape(d, per, f).astype(buf3.dtype)

        f_cp = custom_partitioning(global_fn)

        def partition(mesh, arg_shapes, out_shape):
            return (mesh, shard_fn,
                    jax.tree.map(lambda x: x.sharding, out_shape),
                    jax.tree.map(lambda x: x.sharding, arg_shapes))

        def infer_sharding(mesh, arg_shapes, out_shape):
            return arg_shapes[0].sharding

        f_cp.def_partition(
            partition=partition,
            infer_sharding_from_operands=infer_sharding,
            sharding_rule="d i j, d k l, d m, d n -> d i j")
        if d_count == 1:
            # a 1-device mesh never invokes the partition path (XLA runs
            # the global fallback), which would silently bench the jnp
            # stage; call the shard lowering directly — it IS the
            # production local stage
            return shard_fn
        return f_cp

    steps = [make_step(s) for s in range(d_count)]

    from jax.sharding import NamedSharding
    sh_rows = NamedSharding(mesh, P(axis))

    @jax.jit
    def run(h, a_steps, ws_steps, br_steps):
        f = h.shape[-1]
        # explicit constraints: the reshape breaks GSPMD propagation into
        # the custom_partitioning calls (observed: every shard received
        # chunk 0 — the operands arrived replicated)
        constrain = lambda x: jax.lax.with_sharding_constraint(x, sh_rows)
        buf = constrain(h.reshape(d_count, per, f))
        out = jnp.zeros((d_count, per, f), h.dtype)
        for s in range(d_count):
            out = out + steps[s](buf, constrain(a_steps[s]),
                                 constrain(ws_steps[s]),
                                 constrain(br_steps[s]))
            if s < d_count - 1:
                buf = constrain(jnp.roll(buf, shift=-1, axis=0))
        return out.reshape(d_count * per, f)

    def prepare():
        return (jax.device_put(part.a_dense, sh_rows),
                jax.device_put(part.w_start, sh_rows),
                jax.device_put(part.block_rows, sh_rows))

    def call(h):
        h = jax.device_put(h, sh_rows)
        return run(h, *prepare())

    call.run = run
    call.prepare = prepare
    return call


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
