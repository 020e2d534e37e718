"""Geometric-topology SpMM benchmark: the domain's real graph shape.

The reference builds its interference graph from pairwise vehicle distances
on a Manhattan road grid (Environment.py:360-376); configs 4-5's synthetic
benchmarks previously used *uniform random* graphs — the one topology with
zero locality. This bench measures what the layout machinery buys on the
scaled geometric analog (`graph.geometric_interference_graph`):

  * blocked (gather-based) kernel: random vs geometric vs geometric+BFS
  * paged-cell fused-gather kernel (`spmm_paged`) on geometric+BFS —
    no [E, F] HBM message round trip at all

Usage: python benchmarks/geometric_bench.py [--nodes N] [--degree D]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.spmm_bench import bench, report


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--nodes", type=int, default=100_000)
    parser.add_argument("--degree", type=float, default=10.0)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--r-block", type=int, default=256)
    parser.add_argument("--paged-r", type=int, default=128)
    parser.add_argument("--paged-chunk", type=int, default=128)
    parser.add_argument("--paged-page", type=int, default=256)
    parser.add_argument("--win-r", type=int, default=256)
    parser.add_argument("--window", type=int, default=0,
                        help="A-tile width; 0 = auto (tightest multiple "
                        "of 128 covering the widest block span)")
    parser.add_argument("--skip-blocked", action="store_true")
    args = parser.parse_args(argv)

    from gnnra_tpu import graph as graph_lib
    from gnnra_tpu.experimental import paged as paged_lib
    from gnnra_tpu.ops import spmm

    n, f = args.nodes, args.dim
    t0 = time.time()
    _, g_geo = graph_lib.geometric_interference_graph(
        0, n, target_degree=args.degree)
    e = g_geo.num_edges
    print(f"# geometric graph: {n} nodes, {e} edges "
          f"(deg {e / n:.1f}), gen {time.time() - t0:.1f}s", flush=True)
    g_rand = graph_lib.random_graph_host(0, n, e)
    g_bfs, _ = graph_lib.reorder_nodes(g_geo, "bfs")

    h = jax.random.normal(jax.random.PRNGKey(1), (n, f))
    h16 = h.astype(jnp.bfloat16)

    if not args.skip_blocked:
        for name, g in (("random", g_rand), ("geometric", g_geo),
                        ("geometric_bfs", g_bfs)):
            blk = graph_lib.block_by_receiver(g, r_block=args.r_block)
            t = bench(lambda h, b: spmm.spmm_blocked(h, b, impl="pallas"),
                      h, iters=args.iters, data=(blk,))
            report(f"spmm_fwd_blocked_{name}", e, t)

    t0 = time.time()
    paged_f = paged_lib.page_cells(g_bfs, r_block=args.paged_r,
                                   chunk=args.paged_chunk,
                                   page=args.paged_page)
    paged_b = paged_lib.page_cells(g_bfs.transpose(), r_block=args.paged_r,
                                   chunk=args.paged_chunk,
                                   page=args.paged_page)
    pad = paged_f.num_pages * paged_f.page / e - 1
    print(f"# paged layout: {paged_f.num_pages} pages of {paged_f.page}, "
          f"pad {pad:.1%}, preprocess {time.time() - t0:.1f}s", flush=True)

    t_pf = bench(lambda h, p: paged_lib.spmm_paged(h, p), h,
                 iters=args.iters, data=(paged_f,))
    report("spmm_fwd_paged_geo_bfs", e, t_pf)
    t_pf16 = bench(lambda h, p: paged_lib.spmm_paged(h, p), h16,
                   iters=args.iters, data=(paged_f,))
    report("spmm_fwd_paged_geo_bfs_bf16", e, t_pf16)

    op = paged_lib.make_spmm_paged(paged_f, paged_b, impl="pallas")
    paged_fb = jax.grad(lambda h: jnp.sum(op(h) * h))
    t_pg = bench(paged_fb, h, iters=args.iters)
    report("spmm_fwdbwd_paged_geo_bfs", e, t_pg)
    t_pg16 = bench(paged_fb, h16, iters=args.iters)
    report("spmm_fwdbwd_paged_geo_bfs_bf16", e, t_pg16)

    # windowed-dense: one MXU matmul per receiver block, zero gathers
    win = args.window if args.window > 0 else None
    for dt, tag in ((jnp.int8, "int8"), (jnp.bfloat16, "bf16"),
                    (jnp.float32, "f32")):
        t0 = time.time()
        wd_f = graph_lib.window_dense(g_bfs, r_block=args.win_r,
                                      window=win, dtype=dt)
        wd_b = graph_lib.window_dense(g_bfs.transpose(),
                                      r_block=args.win_r,
                                      window=win, dtype=dt)
        a_mb = wd_f.a_dense.size * wd_f.a_dense.dtype.itemsize / 1e6
        print(f"# windowed-dense {tag}: W={wd_f.window} A={a_mb:.0f}MB "
              f"preprocess {time.time() - t0:.1f}s", flush=True)
        hh = h.astype(jnp.bfloat16 if dt == jnp.int8 else dt)
        t_w = bench(lambda h, wd: spmm.spmm_windowed(h, wd), hh,
                    iters=args.iters, data=(wd_f,))
        report(f"spmm_fwd_windowed_geo_bfs_{tag}", e, t_w)
        wop = spmm.make_spmm_windowed_call(impl="pallas")
        w_fb = jax.grad(
            lambda h, f_, b_: jnp.sum(wop(h, f_, b_).astype(h.dtype) * h),
            argnums=0)
        t_wg = bench(w_fb, hh, iters=args.iters, data=(wd_f, wd_b))
        report(f"spmm_fwdbwd_windowed_geo_bfs_{tag}", e, t_wg)


if __name__ == "__main__":
    main()
