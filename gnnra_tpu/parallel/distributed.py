"""Multi-host runtime initialization (jax.distributed over ICI/DCN).

The reference is strictly single-process / single-GPU
(RL_Train_main.py:13-19); multi-host is a new capability. JAX's
multi-controller model: every host runs the SAME program, calls
`jax.distributed.initialize`, and sees the global device set via
`jax.devices()` (local chips via `jax.local_devices()`). Meshes built over
the global devices make GSPMD/shard_map programs place collectives on ICI
within a slice and DCN across slices automatically — no explicit
NCCL/MPI-style backend to manage.

Typical launch (one command per host, e.g. via gcloud/SSH fan-out):

    COORDINATOR=host0:8476 NPROC=4 PROC_ID=$i python train.py ...

with train.py calling `initialize_from_env()` before any jax use.
On Cloud TPU VMs the three values are auto-detected by JAX's cluster
environment and `initialize_from_env()` degrades to a plain
`jax.distributed.initialize()`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_from_env(coordinator: Optional[str] = None,
                        num_processes: Optional[int] = None,
                        process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime if multi-process is requested.

    Resolution order: explicit args > GNNRA_COORDINATOR / GNNRA_NPROC /
    GNNRA_PROC_ID env vars > JAX cluster auto-detection (TPU VM metadata).
    Returns True if the distributed runtime was initialized, False for
    single-process runs (the no-op path keeps every entry point usable
    unchanged on one host).
    """
    coordinator = coordinator or os.environ.get("GNNRA_COORDINATOR")
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["GNNRA_NPROC"]) if "GNNRA_NPROC" in os.environ
        else None)
    process_id = process_id if process_id is not None else (
        int(os.environ["GNNRA_PROC_ID"]) if "GNNRA_PROC_ID" in os.environ
        else None)

    if coordinator is None and num_processes is None:
        # No explicit request; try JAX's cluster auto-detection only when
        # it can possibly succeed (TPU VM). Single host: stay local.
        return False

    if num_processes is not None and num_processes <= 1:
        return False

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs (host 0)."""
    return jax.process_index() == 0


def global_mesh(axis_sizes=None, axis_names=("data",)):
    """Mesh over the GLOBAL device set (all hosts). With the default 1D
    'data' axis this gives pure DP with gradient psum over ICI/DCN; pass
    (hosts, chips_per_host) shapes for hierarchical DP x TP layouts where
    the inner axis stays on ICI."""
    from gnnra_tpu.parallel.mesh import make_mesh
    return make_mesh(axis_sizes, tuple(axis_names), devices=jax.devices())
