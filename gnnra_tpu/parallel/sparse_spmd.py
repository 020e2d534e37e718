"""Node-sharded SPARSE GNN-DQN training step (config-5 composition).

The BASELINE north star scales the GRAPH axis across chips ("graph
partitioning is the CP analog", SURVEY.md §2): node features and every
per-node activation are row-sharded over the mesh, neighborhood
aggregation is the GSPMD halo-exchange ring
(`graph_parallel.make_ring_spmm_windowed_gspmd` — the jnp windowed local
stage, which is differentiable end to end: `jnp.roll`'s cotangent is the
reverse roll, i.e. the ring transposes itself), the per-node dense
layers are local by construction, and the replicated parameters receive
their gradient all-reduce from GSPMD automatically.

This composes the whole config-5 training system — K-round sparse model,
ring aggregation, Bellman targets, Huber loss, keras-semantics Adam —
into ONE jitted multi-chip program (reference training-loop anchor
BS_brain.py:750-910; aggregation semantics BS_brain.py:69-76). The
forward-only Pallas ring (`make_ring_spmm_windowed_pallas_gspmd`) is the
faster inference path; training uses the differentiable ring.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnnra_tpu.config import ModelConfig
from gnnra_tpu.models import gnn_dqn_sparse
from gnnra_tpu.ops import losses, optim
from gnnra_tpu.parallel import graph_parallel


def make_sparse_spmd_train_step(mesh: Mesh,
                                part: graph_parallel.RingWindowedPartition,
                                cfg: ModelConfig, axis: str = "data",
                                gamma: float = 0.5, lr: float = 1e-3,
                                remat: bool = False,
                                banded: bool = True):
    """Build (init_state, train_step) for the node-sharded sparse model.

    All [N_pad, *] tensors are row-sharded over `axis`; params/opt state
    replicated. train_step(state, node, edge, node2, edge2, actions,
    reward, *ring_args) -> (state', loss). `prepare()` on the returned
    object device-puts the ring layout arrays (pass them as arguments —
    the HLO-constant trap, docs/RESULTS.md).

    `banded=True` (default, round 5) aggregates with the boundary-band
    halo exchange (`make_banded_spmm_gspmd`): per nonempty cross-chunk
    step, only the ~window-wide sender band moves (collective-permute of
    [band, F] instead of the full [per, F] chunk — ~100x less comm at
    config-5 scale), and every K-round aggregation in forward + backward
    pays the banded cost. The banded builder is differentiable end to
    end like the full-chunk ring (band-gather cotangent = scatter back
    into the resident chunk; roll cotangent = reverse roll).
    """
    n_pad = part.num_devices * part.nodes_per_device
    if banded:
        ring = graph_parallel.make_banded_spmm_gspmd(mesh, part, axis=axis)
    else:
        ring = graph_parallel.make_ring_spmm_windowed_gspmd(mesh, part,
                                                            axis=axis)
    opt = optim.keras_adam(lr, b1=0.5)
    sh_rows = NamedSharding(mesh, P(axis))
    sh_rep = NamedSharding(mesh, P())

    def init_state(key: jax.Array):
        params = gnn_dqn_sparse.init_params(key, cfg)
        params = jax.device_put(params, sh_rep)
        return {"params": params,
                "target": jax.device_put(
                    jax.tree.map(jnp.copy, params), sh_rep),
                "opt": jax.device_put(opt.init(params), sh_rep)}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, node, edge, node2, edge2, actions, reward,
                   *ring_args):
        def agg(h):
            out = ring.run(h, *ring_args)
            return out.astype(h.dtype)

        q_next = gnn_dqn_sparse.apply(state["target"], node2, edge2, agg,
                                      cfg, remat=remat)       # [N_pad, A]
        bellman = reward + gamma * jnp.max(q_next, axis=-1)

        def loss_fn(params):
            q = gnn_dqn_sparse.apply(params, node, edge, agg, cfg,
                                     remat=remat)
            target = jax.lax.stop_gradient(q)
            target = target.at[jnp.arange(q.shape[0]), actions].set(bellman)
            return losses.huber_mean(target, q)

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt_state = opt.update(grads, state["opt"],
                                        state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "target": state["target"],
                "opt": opt_state}, loss

    def prepare():
        return ring.prepare()

    def shard_batch(*arrays):
        """Row-shard [N_pad, *] feature/action tensors."""
        return tuple(jax.device_put(a, sh_rows) for a in arrays)

    train_step.init_state = init_state
    train_step.prepare = prepare
    train_step.shard_batch = shard_batch
    train_step.n_pad = n_pad
    return train_step
