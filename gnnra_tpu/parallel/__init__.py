"""Scale-out: device meshes, data-parallel training, graph partitioning."""

from gnnra_tpu.parallel.mesh import make_mesh  # noqa: F401
from gnnra_tpu.parallel.dp import (  # noqa: F401
    DPTrainState,
    init_dp_state,
    make_dp_train_step,
)
