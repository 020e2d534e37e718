"""Utilities: checkpointing, metrics persistence, plotting, profiling."""

from gnnra_tpu.utils import checkpoint  # noqa: F401
