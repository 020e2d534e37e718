"""End-to-end sparse-model TRAINING-step benchmark (BASELINE configs 4-5).

Round-3 gap: configs 4-5 had kernel benches only — the framework's bar is
a training system (the reference's own loop, BS_brain.py:750-910), so this
times a full DQN-style train step of `models.gnn_dqn_sparse` at scale:

  forward through K message-passing rounds (windowed-dense aggregation,
  the measured-fastest kernel for the geometric topology) + Bellman
  targets from a target network + Huber loss + backward (transposed
  windowed kernels) + a keras-semantics Adam update — everything the
  production trainer composes, minus the (graph-size-independent) channel
  simulator.

Reported per scale:
  * train steps/s
  * effective fwd+bwd edge-visits/s = E * gnn_rounds * 2 / t  (each round
    aggregates every edge once forward and once transposed in backward;
    the target-net forward adds rounds more, NOT counted — the metric
    stays comparable with the kernel benches' fwd+bwd definition)

Usage: python benchmarks/sparse_train_bench.py [--nodes N] [--remat]
       [--dim F] [--rounds K] [--iters I] [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def build_train_step(cfg, call, gamma=0.5, lr=1e-3, remat=False,
                     impl="pallas"):
    """One jitted DQN-style train step with the windowed layouts as
    ARGUMENTS (constants would blow the remote-compile transport)."""
    from gnnra_tpu.models import gnn_dqn_sparse
    from gnnra_tpu.ops import optim

    opt = optim.keras_adam(lr, b1=0.5)

    def train_step(state, node, edge, node2, edge2, actions, reward,
                   fwd_wd, bwd_wd):
        agg = lambda h: call(h, fwd_wd, bwd_wd)

        q_next = gnn_dqn_sparse.apply(state["target"], node2, edge2, agg,
                                      cfg, remat=remat)          # [N, A]
        bellman = reward + gamma * jnp.max(q_next, axis=-1)       # [N]

        def loss_fn(params):
            q = gnn_dqn_sparse.apply(params, node, edge, agg, cfg,
                                     remat=remat)                 # [N, A]
            target = jax.lax.stop_gradient(q)
            n = q.shape[0]
            target = target.at[jnp.arange(n), actions].set(bellman)
            from gnnra_tpu.ops import losses
            return losses.huber_mean(target, q)

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt_state = opt.update(grads, state["opt"],
                                        state["params"])
        import optax
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "target": state["target"],
                "opt": opt_state}, loss

    return train_step


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--nodes", type=int, default=100_000)
    parser.add_argument("--degree", type=float, default=10.0)
    parser.add_argument("--dim", type=int, default=128,
                        help="message width F (num_feedback)")
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--remat", action="store_true",
                        help="jax.checkpoint per round (1M-node variant)")
    parser.add_argument("--a-dtype", default="int8",
                        choices=["int8", "bfloat16", "float32"])
    parser.add_argument("--bucketed", action="store_true",
                        help="variable-width bucketed A layouts (the "
                        "picker's default; +10%% kernel edges/s at 100k)")
    parser.add_argument("--impl", default="pallas")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from gnnra_tpu import graph as graph_lib
    from gnnra_tpu.config import ModelConfig
    from gnnra_tpu.models import gnn_dqn_sparse
    from gnnra_tpu.ops import spmm as spmm_lib

    n = args.nodes
    t0 = time.time()
    _, g = graph_lib.geometric_interference_graph(
        0, n, target_degree=args.degree)
    gb, _ = graph_lib.reorder_nodes(g, "bfs")
    e = gb.num_edges
    a_dtype = dict(int8=jnp.int8, bfloat16=jnp.bfloat16,
                   float32=jnp.float32)[args.a_dtype]
    if args.bucketed:
        fwd_wd = graph_lib.window_dense_bucketed(gb, r_block=256,
                                                 dtype=a_dtype)
        bwd_wd = graph_lib.window_dense_bucketed(gb.transpose(),
                                                 r_block=256,
                                                 dtype=a_dtype)
        w_desc = f"widths={fwd_wd.widths}"
    else:
        fwd_wd = graph_lib.window_dense(gb, r_block=256, dtype=a_dtype)
        bwd_wd = graph_lib.window_dense(gb.transpose(), r_block=256,
                                        dtype=a_dtype)
        w_desc = f"W={fwd_wd.window}"
    print(f"# {n} nodes / {e} edges geometric+BFS, {w_desc} "
          f"A={args.a_dtype}, preprocess {time.time() - t0:.1f}s",
          flush=True)

    cfg = ModelConfig(n_nodes=n, num_feedback=args.dim,
                      gnn_rounds=args.rounds, share_weights=True,
                      dtype="bfloat16" if args.a_dtype != "float32"
                      else "float32")
    key = jax.random.PRNGKey(0)
    params = gnn_dqn_sparse.init_params(key, cfg)
    from gnnra_tpu.ops import optim
    opt = optim.keras_adam(1e-3, b1=0.5)
    # target must be distinct buffers — donate_argnums rejects the same
    # buffer appearing twice in a donated pytree
    state = {"params": params, "target": jax.tree.map(jnp.copy, params),
             "opt": opt.init(params)}

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    node = jax.random.normal(k1, (n, cfg.node_dim))
    edge = jax.random.normal(k2, (n, cfg.edge_dim))
    node2 = jax.random.normal(k3, (n, cfg.node_dim))
    edge2 = jax.random.normal(k4, (n, cfg.edge_dim))
    actions = jax.random.randint(k5, (n,), 0, cfg.n_rb)
    reward = jnp.float32(1.0)

    call = spmm_lib.make_spmm_windowed_call(impl=args.impl,
                                            out_dtype="input")
    step = build_train_step(cfg, call, remat=args.remat, impl=args.impl)

    # serialized chain with forced execution (CLAUDE.md measurement
    # discipline): each iteration's node features depend on the previous
    # loss through one element; one scalar pulled to host at the end.
    # Two-point slope cancels the session-varying per-call round trip.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def loop(state, n_iters, node, edge, node2, edge2, actions, reward,
             fwd_wd, bwd_wd):
        def body(_, carry):
            state, node, loss = carry
            state, loss = step(state, node, edge, node2, edge2, actions,
                               reward, fwd_wd, bwd_wd)
            node = node.at[0, 0].add(loss * 1e-6)
            return state, node, loss
        state, node, loss = jax.lax.fori_loop(
            0, n_iters, body, (state, node, jnp.float32(0.0)))
        return state, loss

    def timed(state, n):
        t0 = time.perf_counter()
        state, loss = loop(state, n, node, edge, node2, edge2,
                           actions, reward, fwd_wd, bwd_wd)
        float(loss)
        return time.perf_counter() - t0, state, loss

    t0 = time.time()
    state, loss = loop(state, args.iters, node, edge, node2, edge2,
                       actions, reward, fwd_wd, bwd_wd)
    float(loss)
    print(f"# compile+warm {time.time() - t0:.1f}s (loss {float(loss):.4f})",
          flush=True)
    # adaptive floor + min-of-k + slope (spmm_bench.bench discipline)
    it = args.iters
    t_n, state, loss = timed(state, it)
    while t_n < 0.2 and it < 1 << 12:
        it *= 4
        t_n, state, loss = timed(state, it)
    for _ in range(2):
        t, state, loss = timed(state, it)
        t_n = min(t_n, t)
    t_2n = None
    for _ in range(2):
        t, state, loss = timed(state, 2 * it)
        t_2n = t if t_2n is None else min(t_2n, t)
    dt = ((t_2n - t_n) / it if t_2n > t_n else t_n / it)

    steps_s = 1.0 / dt
    edge_visits = e * args.rounds * 2 / dt
    tag = f"{n // 1000}k" if n < 1_000_000 else f"{n // 1_000_000}M"
    print(json.dumps({
        "metric": f"sparse_train_step_{tag}"
                  + ("_remat" if args.remat else ""),
        "value": round(steps_s, 3), "unit": "steps/s",
        "vs_baseline": round(edge_visits / 1e9, 4),
    }) + f"  # {edge_visits / 1e9:.3f} Gedge-visits/s fwd+bwd "
        f"(E*rounds*2), step {dt * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
