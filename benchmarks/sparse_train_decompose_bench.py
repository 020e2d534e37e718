"""Decompose the 1M-node composed sparse TRAINING step (round-5 item 4).

Round 4 benchmarked the config-5 composition at 7.9 steps/s (127 ms) —
a 2.8x composed-vs-kernel gap with no published breakdown. This bench
times each phase of the SAME step as its own serialized chain
(spmm_bench.bench discipline) so the split is measured, not inferred:

  agg_fwd      one forward windowed aggregation (the kernel alone)
  agg_bwd      one transposed aggregation (the backward kernel)
  fwd_model    one full model forward: K rounds x (combine + aggregate)
               + per-node Q-heads
  grad_only    value_and_grad of the Huber loss against a PRECOMPUTED
               Bellman target (forward + backward, NO target forward)
  adam         keras-semantics Adam update on fixed gradients
  full         the complete train step (target fwd + grad + Adam)

Derived rows printed at the end:
  target_fwd ~= full - grad_only - adam
  dense_fwd  ~= fwd_model - K * agg_fwd      (combine einsums + heads)
  bwd_extra  ~= grad_only - fwd_model - K * agg_bwd [- remat recompute]

Usage: python benchmarks/sparse_train_decompose_bench.py
         [--nodes N] [--dim F] [--remat] [--narrow-f] [--a-dtype D]
--narrow-f uses the round-5 feature-major windowed_t layouts (the
picker's choice for F <= 32).
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


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--nodes", type=int, default=1_000_000)
    parser.add_argument("--degree", type=float, default=10.0)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--narrow-f", action="store_true")
    parser.add_argument("--a-dtype", default="int8",
                        choices=["int8", "bfloat16", "float32"])
    parser.add_argument("--impl", default="pallas")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from benchmarks.spmm_bench import bench
    from gnnra_tpu import graph as graph_lib
    from gnnra_tpu.config import ModelConfig
    from gnnra_tpu.models import gnn_dqn_sparse
    from gnnra_tpu.ops import losses, optim
    from gnnra_tpu.ops import spmm as spmm_lib
    import optax

    n = args.nodes
    t0 = time.time()
    _, g = graph_lib.geometric_interference_graph(
        0, n, target_degree=args.degree)
    gb, _ = graph_lib.reorder_nodes(g, "bfs")
    e = gb.num_edges
    a_dtype = dict(int8=jnp.int8, bfloat16=jnp.bfloat16,
                   float32=jnp.float32)[args.a_dtype]
    if args.narrow_f:
        fwd_wd = graph_lib.window_dense_t(gb, r_block=256, dtype=a_dtype)
        bwd_wd = graph_lib.window_dense_t(gb.transpose(), r_block=256,
                                          dtype=a_dtype)
        call = spmm_lib.make_spmm_windowed_t_call(impl=args.impl,
                                                  out_dtype="input")
        w_desc = f"W_t={fwd_wd.window}"
    else:
        fwd_wd = graph_lib.window_dense(gb, r_block=256, dtype=a_dtype)
        bwd_wd = graph_lib.window_dense(gb.transpose(), r_block=256,
                                        dtype=a_dtype)
        call = spmm_lib.make_spmm_windowed_call(impl=args.impl,
                                                out_dtype="input")
        w_desc = f"W={fwd_wd.window}"
    print(f"# {n} nodes / {e} edges, {w_desc} A={args.a_dtype} "
          f"F={args.dim} remat={args.remat} narrow_f={args.narrow_f}, "
          f"preprocess {time.time() - t0:.1f}s", flush=True)

    cfg = ModelConfig(n_nodes=n, num_feedback=args.dim,
                      gnn_rounds=args.rounds, share_weights=True,
                      dtype="bfloat16" if args.a_dtype != "float32"
                      else "float32")
    key = jax.random.PRNGKey(0)
    params = gnn_dqn_sparse.init_params(key, cfg)
    opt = optim.keras_adam(1e-3, b1=0.5)
    opt_state = opt.init(params)
    target = jax.tree.map(jnp.copy, params)

    k1, k2, k3 = jax.random.split(key, 3)
    node = jax.random.normal(k1, (n, cfg.node_dim))
    edge = jax.random.normal(k2, (n, cfg.edge_dim))
    actions = jax.random.randint(k3, (n,), 0, cfg.n_rb)
    reward = jnp.float32(1.0)
    h16 = jax.random.normal(k1, (n, args.dim)).astype(
        jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32)
    bellman_const = jnp.ones((n,), jnp.float32)

    agg = lambda h, f_, b_: call(h, f_, b_)
    results = {}

    def report(name, t, aggs_counted):
        results[name] = t
        rate = e * aggs_counted / t / 1e9 if aggs_counted else None
        print(json.dumps({
            "metric": f"decomp_{name}", "value": round(t * 1e3, 2),
            "unit": "ms",
            "vs_baseline": round(rate, 3) if rate else None,
        }) + (f"  # {rate:.3f} Gedges/s over {aggs_counted} agg(s)"
              if aggs_counted else ""), flush=True)

    # 1/2: bare kernels
    t = bench(lambda h, f_, b_: call(h, f_, b_), h16, data=(fwd_wd, bwd_wd))
    report("agg_fwd", t, 1)
    t = bench(lambda h, f_, b_: call(h, b_, f_), h16, data=(fwd_wd, bwd_wd))
    report("agg_bwd", t, 1)

    # 3: model forward
    def fwd_model(nd, f_, b_):
        return gnn_dqn_sparse.apply(params, nd, edge,
                                    lambda h: agg(h, f_, b_), cfg,
                                    remat=args.remat)
    t = bench(fwd_model, node, data=(fwd_wd, bwd_wd))
    report("fwd_model", t, args.rounds)

    # 4: forward + backward, no target forward
    def grad_only(nd, f_, b_):
        def loss_fn(p):
            q = gnn_dqn_sparse.apply(p, nd, edge,
                                     lambda h: agg(h, f_, b_), cfg,
                                     remat=args.remat)
            tgt = jax.lax.stop_gradient(q)
            tgt = tgt.at[jnp.arange(n), actions].set(bellman_const)
            return losses.huber_mean(tgt, q)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss[None] + jax.tree.leaves(grads)[0].ravel()[0]
    t = bench(grad_only, node, data=(fwd_wd, bwd_wd))
    report("grad_only", t, 2 * args.rounds)

    # 5: Adam alone (fixed grads = params scaled; graph-size-independent)
    grads_fixed = jax.tree.map(lambda x: x * 1e-3, params)
    def adam_step(x, _f, _b):
        up, _ = opt.update(jax.tree.map(lambda gg: gg + x[0, 0] * 1e-9,
                                        grads_fixed), opt_state, params)
        p2 = optax.apply_updates(params, up)
        return jax.tree.leaves(p2)[0].ravel()[:1]
    t = bench(adam_step, node[:8, :8], data=(fwd_wd, bwd_wd))
    report("adam", t, 0)

    # 6: the full step
    def full(nd, f_, b_):
        a = lambda h: agg(h, f_, b_)
        q_next = gnn_dqn_sparse.apply(target, nd, edge, a, cfg,
                                      remat=args.remat)
        bellman = reward + 0.5 * jnp.max(q_next, axis=-1)
        def loss_fn(p):
            q = gnn_dqn_sparse.apply(p, nd, edge, a, cfg,
                                     remat=args.remat)
            tgt = jax.lax.stop_gradient(q)
            tgt = tgt.at[jnp.arange(n), actions].set(bellman)
            return losses.huber_mean(tgt, q)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        up, _ = opt.update(grads, opt_state, params)
        p2 = optax.apply_updates(params, up)
        return loss[None] + jax.tree.leaves(p2)[0].ravel()[0]
    t = bench(full, node, data=(fwd_wd, bwd_wd))
    report("full", t, 3 * args.rounds)

    # derived split
    k = args.rounds
    tgt_fwd = results["full"] - results["grad_only"] - results["adam"]
    dense_fwd = results["fwd_model"] - k * results["agg_fwd"]
    bwd_extra = (results["grad_only"] - results["fwd_model"]
                 - k * results["agg_bwd"])
    print(f"# derived: target_fwd={tgt_fwd * 1e3:.2f} ms "
          f"dense_fwd={dense_fwd * 1e3:.2f} ms "
          f"bwd_beyond_kernels={bwd_extra * 1e3:.2f} ms "
          f"(incl. remat recompute + dense bwd + loss)")
    steps_s = 1.0 / results["full"]
    print(json.dumps({
        "metric": ("sparse_train_step_decomposed"
                   + ("_narrowf" if args.narrow_f else "")),
        "value": round(steps_s, 3), "unit": "steps/s",
        "vs_baseline": round(e * k * 2 / results["full"] / 1e9, 4)}))


if __name__ == "__main__":
    main()
