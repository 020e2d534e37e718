"""Model families: GNN-DQN over the interference graph."""

from gnnra_tpu.models import gnn_dqn  # noqa: F401
from gnnra_tpu.models.gnn_dqn import (  # noqa: F401
    apply,
    apply_single,
    init_params,
    update_target,
)
