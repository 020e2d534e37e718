"""Compute primitives: GNN combine/aggregate, losses, sparse kernels."""

from gnnra_tpu.ops.gnn import (  # noqa: F401
    aggregate_dense,
    aggregate_sparse,
    gnn_combine,
    gnn_combine_shared,
)
from gnnra_tpu.ops.losses import dqn_loss, huber, huber_mean  # noqa: F401
from gnnra_tpu.ops.optim import keras_adam  # noqa: F401
