"""Device-mesh helpers.

The reference has no multi-device support of any kind (one process, one GPU —
reference RL_Train_main.py:13-19); every capability here is new, built on
`jax.sharding.Mesh` + `shard_map`/GSPMD with XLA collectives over ICI
(SURVEY.md §2 parallelism checklist).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401


def make_mesh(axis_sizes: Optional[Sequence[int]] = None,
              axis_names: Tuple[str, ...] = ("data",),
              devices=None) -> Mesh:
    """Build a Mesh over the available (or given) devices.

    make_mesh() -> 1D 'data' mesh over all devices;
    make_mesh((2, 4), ("data", "model")) -> 2D mesh.
    """
    devices = jax.devices() if devices is None else devices
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    assert np.prod(axis_sizes) == len(devices), \
        f"mesh {axis_sizes} needs {np.prod(axis_sizes)} devices, " \
        f"got {len(devices)}"
    arr = np.asarray(devices).reshape(axis_sizes)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading axis over the given mesh axis."""
    return NamedSharding(mesh, P(axis))
