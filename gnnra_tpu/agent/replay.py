"""Device-resident replay memory.

Re-designs `class Memory` (reference BS_brain.py:245-270) — a Python list of
numpy tuples sampled on host — as a fixed-size ring of device rows updated
inside jit, so transition generation and replay sampling never leave the TPU.

A transition stores the GNN inputs directly (node/edge features + adjacency)
instead of the reference's flat concatenated state vector
(BS_brain.py:469,545); the next state shares the current adjacency, which is
also the reference's behavior (S' adjacency aliased to S at BS_brain.py:583).

Storage layout — two invariants, both measured on TPU:

1. Rows are FLAT: the ring is a single 2-D [capacity, row] f32 array; field
   tensors are packed into static column spans and restored to model-facing
   [B, N, ...] shapes at gather time. With 3-D [C, N, D] buffers, XLA's
   layout assignment gives the in-loop row *gather* (sampling) a batch-minor
   layout while the row *scatter/DUS* (append) keeps the row-major carry
   layout, and reconciles the two with a full-ring relayout copy EVERY
   training step (~2 ms at capacity 100k, linear in capacity).
2. One buffer, not one per field: TPU row gathers pay a per-row cost, so
   seven per-field gathers of the same 512 sampled rows cost ~7 fixed
   overheads (measured ~48 us of the 341 us parity train step); a single
   [B, row] gather + static column slices pays it once. The append
   (`dynamic_update_slice` of a contiguous burst — row scatters execute
   row-by-row on TPU and measured 11x slower) also lands as ONE write.

Actions are stored as f32 rows like everything else (RB indices are tiny
integers, exactly representable; gather rounds them back to int32).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from gnnra_tpu.config import ModelConfig, TrainConfig


class ReplayState(struct.PyTreeNode):
    """Ring buffer of transitions (capacity C, N nodes).

    `data` rows pack [node (N*dn) | edge (N*de) | adj (N*N) | action (N) |
    reward (1) | next_node (N*dn) | next_edge (N*de)]; `dims` carries the
    static (n_nodes, node_dim, edge_dim) needed to split them.
    """

    data: jax.Array       # [C, row] f32
    cursor: jax.Array     # [] int32  next write slot
    size: jax.Array       # [] int32  number of valid entries
    dims: Tuple[int, int, int] = struct.field(pytree_node=False)

    def _span(self, i: int) -> jax.Array:
        n, dn, de = self.dims
        spans = [n * dn, n * de, n * n, n, 1, n * dn, n * de]
        off = sum(spans[:i])
        return self.data[:, off:off + spans[i]]

    # Column views (whole-ring, flat rows) — introspection/test convenience;
    # the training path uses `gather`.
    @property
    def node(self) -> jax.Array:
        return self._span(0)

    @property
    def edge(self) -> jax.Array:
        return self._span(1)

    @property
    def adj(self) -> jax.Array:
        return self._span(2)

    @property
    def action(self) -> jax.Array:
        return jnp.round(self._span(3)).astype(jnp.int32)

    @property
    def reward(self) -> jax.Array:
        return self._span(4)[:, 0]

    @property
    def next_node(self) -> jax.Array:
        return self._span(5)

    @property
    def next_edge(self) -> jax.Array:
        return self._span(6)


def _row_width(n: int, dn: int, de: int) -> int:
    return n * dn + n * de + n * n + n + 1 + n * dn + n * de


def init(model_cfg: ModelConfig, capacity: int) -> ReplayState:
    n, dn, de = model_cfg.n_nodes, model_cfg.node_dim, model_cfg.edge_dim
    return ReplayState(
        data=jnp.zeros((capacity, _row_width(n, dn, de))),
        cursor=jnp.zeros((), jnp.int32), size=jnp.zeros((), jnp.int32),
        dims=(n, dn, de))


def _pack(t: int, node, edge, adj, action, reward, next_node, next_edge
          ) -> jax.Array:
    return jnp.concatenate(
        [node.reshape(t, -1), edge.reshape(t, -1), adj.reshape(t, -1),
         action.reshape(t, -1).astype(jnp.float32),
         reward.reshape(t, 1),
         next_node.reshape(t, -1), next_edge.reshape(t, -1)], axis=1)


def add(state: ReplayState, node, edge, adj, action, reward,
        next_node, next_edge) -> ReplayState:
    """Append one transition (FIFO overwrite past capacity,
    reference BS_brain.py:252-256)."""
    c = state.cursor
    capacity = state.data.shape[0]
    row = _pack(1, node, edge, adj, action, jnp.reshape(reward, (1,)),
                next_node, next_edge)
    return state.replace(
        data=jax.lax.dynamic_update_slice(state.data, row, (c, 0)),
        cursor=(c + 1) % capacity,
        size=jnp.minimum(state.size + 1, capacity))


def add_batch(state: ReplayState, node, edge, adj, action, reward,
              next_node, next_edge) -> ReplayState:
    """Append a [T, ...] batch of transitions (FIFO rows at
    (cursor + arange(T)) % capacity, reference BS_brain.py:252-256).

    The burst is a CONTIGUOUS run of rows, so whenever it does not wrap the
    ring edge it lands as one `dynamic_update_slice` — a straight DMA —
    with the row-scatter kept only for the wrap step. TPU row scatters
    with dynamic indices execute row-by-row: at config-3 scale
    (12,800-row bursts into a 200k ring) the per-field scatters were ~5 ms
    of the 11 ms train step, and the DUS path measures 11x faster. When
    capacity is a multiple of the burst size (the parity config's 1M ring
    % 50 == 0 already is, and `batched_config` rounds capacity up), the
    cursor stays burst-aligned and the conditional-free fast path is
    emitted (the cond itself measured ~0.4 ms/step)."""
    t = reward.shape[0]
    capacity = state.data.shape[0]
    # With t > capacity the modular indices repeat and .at[idx].set resolves
    # duplicates nondeterministically (NOT FIFO-last-wins); every config keeps
    # burst sizes far below capacity, so reject the degenerate case outright.
    assert t <= capacity, (
        f"replay burst of {t} transitions exceeds ring capacity {capacity}")
    c = state.cursor
    rows = _pack(t, node, edge, adj, action, reward, next_node, next_edge)

    def contiguous(data):
        return jax.lax.dynamic_update_slice(data, rows, (c, 0))

    def wrapped(data):
        idx = (c + jnp.arange(t)) % capacity
        return data.at[idx].set(rows)

    if capacity % t == 0:
        # Burst size divides capacity (both static), so a ring fed only by
        # size-t bursts keeps its cursor t-aligned and a burst NEVER wraps:
        # emit the DUS with no conditional (the cond itself measured
        # ~0.4 ms/step). The alignment is a real invariant, not an
        # assumption: if the cursor is ever desynced (e.g. an interleaved
        # single-row `add`), dynamic_update_slice's index clamp would
        # silently park the burst at capacity-t while the cursor advances
        # (c+t)%capacity — corrupted FIFO order with no signal. Guard it
        # by NaN-poisoning the written rows when c % t != 0: one scalar
        # compare + select (free next to the DUS DMA), and the corruption
        # becomes loud at the first gather/training step instead of
        # silently skewing sampling. Mixing per-row and burst appends on
        # a divisible capacity is unsupported; use a non-divisible
        # capacity to get the cond'd wrap-correct path.
        aligned = (c % t) == 0
        rows = jnp.where(aligned, rows, jnp.float32(jnp.nan))
        data = contiguous(state.data)
    else:
        data = jax.lax.cond(c + t <= capacity, contiguous, wrapped,
                            state.data)
    return state.replace(
        data=data, cursor=(c + t) % capacity,
        size=jnp.minimum(state.size + t, capacity))


def sample_indices(state: ReplayState, key: jax.Array, batch_size: int,
                   cfg: TrainConfig) -> jax.Array:
    """Draw batch indices.

    'fast' (default): uniform ints with replacement — device-cheap and
    statistically indistinguishable once size >> batch.
    'faithful': without replacement like np.random.choice(..., replace=False)
    (reference BS_brain.py:258-263), falling back to with-replacement when
    fewer samples exist (reference BS_brain.py:264-270).
    """
    size = jnp.maximum(state.size, 1)
    if cfg.replay_sampling == "faithful":
        capacity = state.data.shape[0]
        # Gumbel top-k over valid slots = uniform sample without replacement.
        g = jax.random.gumbel(key, (capacity,))
        g = jnp.where(jnp.arange(capacity) < state.size, g, -jnp.inf)
        _, idx = jax.lax.top_k(g, batch_size)
        # with-replacement fallback for size < batch
        k2 = jax.random.fold_in(key, 1)
        idx_wr = jax.random.randint(k2, (batch_size,), 0, size)
        return jnp.where(state.size >= batch_size, idx, idx_wr)
    return jax.random.randint(key, (batch_size,), 0, size)


def gather(state: ReplayState, idx: jax.Array) -> Tuple[jax.Array, ...]:
    """Fetch a batch: (node, edge, adj, action, reward, next_node,
    next_edge) in model-facing [B, N, ...] shapes — ONE row gather plus
    static column slices."""
    n, dn, de = state.dims
    b = idx.shape[0]
    rows = state.data[idx]                                   # [B, row]
    spans = [n * dn, n * de, n * n, n, 1, n * dn, n * de]
    offs = [0]
    for s in spans:
        offs.append(offs[-1] + s)
    node, edge, adj, action, reward, next_node, next_edge = (
        rows[:, o:o + s] for o, s in zip(offs, spans))
    return (node.reshape(b, n, dn), edge.reshape(b, n, de),
            adj.reshape(b, n, n),
            jnp.round(action).astype(jnp.int32), reward[:, 0],
            next_node.reshape(b, n, dn), next_edge.reshape(b, n, de))
