"""Vectorized, jittable V2X environment engine (reference Environment.py)."""

from gnnra_tpu.env.vehicular import (  # noqa: F401
    EnvState,
    act,
    compute_interference_obs,
    compute_reward_with_channel_selection,
    dump_act,
    new_random_game,
    renew_channels_fastfading,
    renew_neighbor,
    v2i_channels_with_fastfading,
    v2v_channels_with_fastfading,
)
from gnnra_tpu.env.features import adjacency, get_state, node_edge_features  # noqa: F401
from gnnra_tpu.env.mobility import renew_positions, spawn_vehicles  # noqa: F401
