"""gnnra_tpu: TPU-native GNN-DQN framework for vehicular resource allocation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Coolzyh/Globecom2020-ResourceAllocationGNN (reference mounted read-only):
graph-neural message passing over the V2V interference graph, a DQN agent per
V2V pair trained with a shared global sum-rate reward, and a Manhattan-grid
vehicular channel simulator — all expressed as pure functions under jit,
vmapped over batched environments, and sharded over device meshes for
scale-out.
"""

__version__ = "0.1.0"

from gnnra_tpu import config  # noqa: F401
