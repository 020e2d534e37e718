"""Narrow-F windowed kernel benchmark (round 5).

Measures the F=16 regime (the model's own num_feedback, reference
BS_brain.py:101-104) across the windowed kernel family on the geometric
topology at HBM-streamed node counts:

  * node-major `spmm_windowed` at F=16 AND F=128 — demonstrates the
    lane-padding equivalence (F=16 runs exactly as slow as F=128);
  * feature-major `spmm_windowed_t` (uniform width);
  * bucketed feature-major `spmm_windowed_t` over
    `window_dense_bucketed_t` — the best F=16 forward at every scale.

Usage: python benchmarks/narrowf_bench.py [--nodes N] [--degree D]
       [--a-dtype int8|bfloat16]
Reported numbers live in docs/RESULTS.md "Narrow-F windowed kernels".
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--nodes", type=int, default=500_000)
    parser.add_argument("--degree", type=float, default=10.7)
    parser.add_argument("--a-dtype", default="int8",
                        choices=["int8", "bfloat16"])
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from benchmarks.spmm_bench import bench
    from gnnra_tpu import graph as graph_lib
    from gnnra_tpu.ops import spmm

    n = args.nodes
    a_dtype = dict(int8=jnp.int8, bfloat16=jnp.bfloat16)[args.a_dtype]
    t0 = time.time()
    _, g = graph_lib.geometric_interference_graph(
        0, n, target_degree=args.degree)
    gb, _ = graph_lib.reorder_nodes(g, "bfs")
    e = gb.num_edges
    print(f"# n={n} e={e} prep={time.time() - t0:.0f}s", flush=True)

    def report(tag, t, extra=""):
        print(json.dumps({"metric": tag, "value": round(e / t / 1e9, 4),
                          "unit": "Gedges/s",
                          "vs_baseline": round(t * 1e3, 2)})
              + (f"  # {extra}" if extra else ""), flush=True)

    wd = graph_lib.window_dense(gb, r_block=256, dtype=a_dtype)
    for f_dim in (16, 128):
        h = jax.random.normal(jax.random.PRNGKey(2), (n, f_dim)
                              ).astype(jnp.bfloat16)
        t = bench(lambda h, w_: spmm.spmm_windowed(h, w_).astype(h.dtype),
                  h, data=(wd,))
        report(f"windowed_{args.a_dtype}_F{f_dim}_n{n}", t,
               f"node-major W={wd.window}")
    del wd

    h16 = jax.random.normal(jax.random.PRNGKey(2), (n, 16)
                            ).astype(jnp.bfloat16)
    wdt = graph_lib.window_dense_t(gb, r_block=256, dtype=a_dtype)
    t = bench(lambda h, w_: spmm.spmm_windowed_t(h, w_).astype(h.dtype),
              h16, data=(wdt,))
    report(f"windowed_t_{args.a_dtype}_F16_n{n}", t,
           f"feature-major W={wdt.window}")
    del wdt

    bwt = graph_lib.window_dense_bucketed_t(gb, r_block=256, dtype=a_dtype)
    t = bench(lambda h, w_: spmm.spmm_windowed_t(h, w_).astype(h.dtype),
              h16, data=(bwt,))
    report(f"bucketed_t_{args.a_dtype}_F16_n{n}", t,
           f"widths={bwt.widths}")


if __name__ == "__main__":
    main()
