"""State featurization: environment channels -> GNN inputs.

Vectorizes `Agent.get_state` (reference BS_brain.py:389-407), the packing code
in `generate_d2d_transition` / `generate_d2d_initial_states`
(BS_brain.py:447-469, 912-984), and the adjacency construction
(BS_brain.py:441-445). One fused gather/normalize instead of per-(pair,
neighbor) Python loops; output feeds the batched GNN directly (no kron-lifted
block adjacency — aggregation works on the [N, N] matrix, see ops.aggregate).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gnnra_tpu.config import EnvConfig
from gnnra_tpu.env import vehicular

# Normalization constants (reference BS_brain.py:393-394).
CONSTANT_A = 80.0
CONSTANT_B = 60.0


def get_state(state: vehicular.EnvState, cfg: EnvConfig
              ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-link channel features.

    Returns:
      v2v_channel [N, M, R]: normalized gain tx->its receiver per RB.
      v2i_channel [N, R]: normalized uplink gain per RB.
      v2v_edge    [N, M, R]: mean other-transmitter interference-channel
        feature (reference BS_brain.py:401-406).
    """
    n = state.positions.shape[0]
    v2v_ff = vehicular.v2v_channels_with_fastfading(state)   # [N, N, R]
    v2i_ff = vehicular.v2i_channels_with_fastfading(state)   # [N, R]
    dest = state.destinations                                # [N, M]

    # Destination selections as one-hot CONTRACTIONS, not advanced-index
    # gathers: under the config-3 [T*E]-vmap, XLA's batched fancy-gathers
    # on these two sites were ~1.4 ms of the train step (round-4 profile),
    # the same pathology the reward engine hit (vehicular.py:194-199).
    # HIGHEST precision keeps the selection exact (one 1.0 per row).
    hi = jax.lax.Precision.HIGHEST
    onehot_dest = jax.nn.one_hot(dest, n, dtype=v2v_ff.dtype)     # [N, M, N]
    v2v_sel = jnp.einsum("nmk,nkr->nmr", onehot_dest, v2v_ff,
                         precision=hi)               # ff[tx, dest, :]
    v2v_channel = (v2v_sel - CONSTANT_A) / CONSTANT_B               # [N, M, R]
    v2i_channel = (v2i_ff - CONSTANT_A) / CONSTANT_B                # [N, R]

    # edge = ((sum_k ff[k, d, :] - ff[d, d, :] - (N-1)*A)/B - v2v_channel)/(N-2)
    col_sum = jnp.sum(v2v_ff, axis=0)                 # [N(rx), R]
    diag = jnp.einsum("kkr->kr", v2v_ff)              # [N, R]
    others = jnp.einsum("nmk,kr->nmr", onehot_dest, col_sum - diag,
                        precision=hi)                 # (col_sum-diag)[dest]
    v2v_edge = (((others - (n - 1) * CONSTANT_A) / CONSTANT_B) - v2v_channel) \
        / (n - 2)
    return v2v_channel, v2i_channel, v2v_edge


def node_edge_features(state: vehicular.EnvState, cfg: EnvConfig
                       ) -> Tuple[jax.Array, jax.Array]:
    """Pack per-node GNN inputs.

    Layout per node (reference BS_brain.py:458-467, for n_neighbor=1):
      node_obs = [v2v_channel (M*R), v2i_channel (R), power (M)]  -> 9 dims
      edge_obs = [v2v_edge (M*R)]                                 -> 4 dims

    Returns (node [N, node_dim], edge [N, edge_dim]) in float32.
    """
    n, m, r = cfg.n_veh, cfg.n_neighbor, cfg.n_rb
    v2v_channel, v2i_channel, v2v_edge = get_state(state, cfg)
    power = cfg.v2v_power_levels_dbm[cfg.fixed_v2v_power_index]
    power_feat = jnp.full((n, m), power)
    node = jnp.concatenate([v2v_channel.reshape(n, m * r),
                            v2i_channel.reshape(n, r),
                            power_feat], axis=-1)
    edge = v2v_edge.reshape(n, m * r)
    return node.astype(jnp.float32), edge.astype(jnp.float32)


def adjacency(state: vehicular.EnvState, cfg: EnvConfig) -> jax.Array:
    """Interference-graph adjacency [N, N].

    Reference BS_brain.py:441-445: A = 1 - I, and A[d, v] = 0 whenever node d
    is vehicle v's first destination (a node does not aggregate from its own
    receiver — aggregation later uses A^T, see ops.aggregate).
    """
    n = cfg.n_veh
    a = jnp.ones((n, n)) - jnp.eye(n)
    dest0 = state.destinations[:, 0]                         # [N]
    mask = jax.nn.one_hot(dest0, n, dtype=a.dtype).T          # mask[d, v]=1 iff d==dest0[v]
    return a * (1.0 - mask)
