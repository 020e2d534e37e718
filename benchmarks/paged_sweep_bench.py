"""Degree sweep for `spmm_paged` — settle its regime (round-4 item 7).

Round 3 showed the paged-cell fused-gather kernel losing to blocked at
degree 10 (each page carries ~85 ns of MXU work against ~505 ns of
grid-step overhead) and kept it "for high-degree graphs" without a
measurement. This sweep holds the edge count fixed (~1M) and raises the
mean degree 10 -> 128 by shrinking the node count, benchmarking the three
candidate kernels on the same BFS-ordered geometric graph:

  * blocked (gather) Pallas kernel          — the degree-insensitive floor
  * windowed-dense bf16                     — cost is per-NODE, so rising
                                              degree amortizes it directly
  * paged-cell bf16                         — per-page MXU work grows with
                                              density; where (if anywhere)
                                              does it cross over?

Usage: python benchmarks/paged_sweep_bench.py [--edges E] [--iters I]
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

from benchmarks.spmm_bench import bench, report


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--edges", type=int, default=1_000_000)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--degrees", type=int, nargs="+",
                        default=[10, 32, 64, 128])
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gnnra_tpu import graph as graph_lib
    from gnnra_tpu.experimental import paged as paged_lib
    from gnnra_tpu.ops import spmm

    f = args.dim
    for deg in args.degrees:
        n = max(1024, args.edges // deg)
        t0 = time.time()
        _, g = graph_lib.geometric_interference_graph(0, n,
                                                      target_degree=deg)
        gb, _ = graph_lib.reorder_nodes(g, "bfs")
        e = gb.num_edges
        print(f"# degree {deg}: {n} nodes / {e} edges "
              f"(actual deg {e / n:.1f}), prep {time.time() - t0:.1f}s",
              flush=True)
        h16 = jax.random.normal(jax.random.PRNGKey(1), (n, f)
                                ).astype(jnp.bfloat16)

        # cap the per-block slot count: e_block ~ deg * r_block and the
        # kernel's VMEM scope (msgs + one-hot) OOMs past ~12k slots
        r_blk = 256
        while deg * r_blk > 10_000 and r_blk > 32:
            r_blk //= 2
        blk = graph_lib.block_by_receiver(gb, r_block=r_blk)
        t = bench(lambda h, b: spmm.spmm_blocked(h, b, impl="pallas"),
                  h16, iters=args.iters, data=(blk,))
        report(f"sweep_deg{deg}_blocked_bf16", e, t)
        print(f"#   blocked r_block={r_blk}", flush=True)

        wd = graph_lib.window_dense(gb, r_block=256, dtype=jnp.bfloat16)
        t = bench(lambda h, w: spmm.spmm_windowed(h, w), h16,
                  iters=args.iters, data=(wd,))
        report(f"sweep_deg{deg}_windowed_bf16", e, t)

        paged = paged_lib.page_cells(gb, r_block=128, chunk=128, page=256)
        pad = paged.num_pages * paged.page / e - 1
        t = bench(lambda h, p: paged_lib.spmm_paged(h, p), h16,
                  iters=args.iters, data=(paged,))
        report(f"sweep_deg{deg}_paged_bf16", e, t)
        print(f"#   paged pad {pad:.1%}, {paged.num_pages} pages",
              flush=True)


if __name__ == "__main__":
    main()
