"""Multi-device SpMM scaling benchmark (BASELINE config 5 harness).

Measures edges/s of the GSPMD ring halo-exchange SpMM at 1, 2, 4, ...
devices on whatever mesh is available and reports scaling efficiency vs
the 1-device local kernel. Two ring variants are benched:

  * one-hot GSPMD ring (`make_ring_spmm_gspmd`) on the uniform random
    topology — the locality-free worst case;
  * windowed GSPMD ring (`make_ring_spmm_windowed_gspmd`) on the
    BFS-ordered geometric topology — the domain's measured-fastest local
    stage (round-4 composition).

The deprecated shard_map ring is NOT benched: every computation inside a
shard_map body runs ~20x degraded on this TPU runtime (docs/RESULTS.md
platform findings); it remains only as the CPU-mesh semantics reference.

On real multi-chip hardware the >=80% 1->4-host target is measured here;
on a single chip / virtual CPU devices the numbers are functional-only
(noted in the output).

Usage: python benchmarks/scaling_bench.py [--nodes N] [--edges E] [--dim F]
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


def bench_chain(op, h, iters=10, data=()):
    """Serialized-chain timing with forced execution, adaptive iteration
    floor, min-of-k sampling and two-point slope — exactly
    benchmarks/spmm_bench.py::bench (shared discipline)."""
    from benchmarks.spmm_bench import bench
    return bench(op, h, iters=iters, data=data)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--nodes", type=int, default=100_000)
    parser.add_argument("--edges", type=int, default=1_000_000)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--impl", default="pallas",
                        help="'pallas' on TPU, 'jnp' on CPU meshes")
    parser.add_argument("--skip-onehot", action="store_true")
    parser.add_argument("--skip-windowed", action="store_true")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (the sitecustomize "
                        "hook pins TPU and OUTRANKS JAX_PLATFORMS; pair "
                        "with XLA_FLAGS=--xla_force_host_platform_"
                        "device_count=N for a virtual mesh)")
    args = parser.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gnnra_tpu import graph as graph_lib
    from gnnra_tpu.ops import spmm
    from gnnra_tpu.parallel import graph_parallel, mesh as mesh_lib

    n, e, f = args.nodes, args.edges, args.dim
    n_dev_all = jax.device_count()
    print(f"# backend={jax.default_backend()} devices={n_dev_all} "
          f"(virtual-device numbers are functional-only)")

    if not args.skip_onehot:
        g = graph_lib.random_graph_host(0, n, e)
        # 1-device baseline: blocked Pallas kernel (the local compute the
        # ring is amortizing on the random topology)
        blocked = graph_lib.block_by_receiver(g, r_block=256)
        h = jax.random.normal(jax.random.PRNGKey(1), (n, f))
        t1 = bench_chain(
            lambda h: spmm.spmm_blocked(h, blocked, impl=args.impl), h)
        base_rate = e / t1
        print(json.dumps({"metric": "spmm_1dev_blocked",
                          "value": round(base_rate / 1e9, 4),
                          "unit": "Gedges/s", "vs_baseline": 1.0}))
        d = 1
        while d <= n_dev_all:
            mesh = mesh_lib.make_mesh((d,), ("data",),
                                      devices=jax.devices()[:d])
            part = graph_parallel.partition_for_ring(g, num_devices=d,
                                                     r_block=256)
            n_pad = part.num_devices * part.nodes_per_device
            ring = graph_parallel.make_ring_spmm_gspmd(mesh, part)
            from jax.sharding import NamedSharding, PartitionSpec as P
            h_pad = jax.device_put(
                jnp.zeros((n_pad, f)).at[:n].set(h),
                NamedSharding(mesh, P("data")))
            t = bench_chain(ring.run, h_pad, data=ring.prepare())
            rate = e / t
            eff = rate / (base_rate * d)
            print(json.dumps({
                "metric": f"spmm_ring_gspmd_{d}dev",
                "value": round(rate / 1e9, 4), "unit": "Gedges/s",
                "vs_baseline": round(rate / base_rate, 3),
            }) + f"  # scaling efficiency {eff:.1%}")
            d *= 2

    if not args.skip_windowed:
        t0 = time.time()
        _, g_geo = graph_lib.geometric_interference_graph(
            0, n, target_degree=max(4.0, e / n))
        gb, _ = graph_lib.reorder_nodes(g_geo, "bfs")
        e_geo = gb.num_edges
        print(f"# geometric graph: {n} nodes / {e_geo} edges, "
              f"prep {time.time() - t0:.1f}s")
        wd = graph_lib.window_dense(gb, r_block=256)
        h = jax.random.normal(jax.random.PRNGKey(2), (n, f)
                              ).astype(jnp.bfloat16)
        t1 = bench_chain(
            lambda h: spmm.spmm_windowed(h, wd, impl=args.impl
                                         ).astype(h.dtype), h)
        base_rate = e_geo / t1
        print(json.dumps({"metric": "spmm_1dev_windowed",
                          "value": round(base_rate / 1e9, 4),
                          "unit": "Gedges/s", "vs_baseline": 1.0}))
        d = 1
        while d <= n_dev_all:
            mesh = mesh_lib.make_mesh((d,), ("data",),
                                      devices=jax.devices()[:d])
            part = graph_parallel.partition_for_ring_windowed(
                gb, num_devices=d, r_block=256)
            n_pad = part.num_devices * part.nodes_per_device
            from jax.sharding import NamedSharding, PartitionSpec as P
            h_pad = jax.device_put(
                jnp.zeros((n_pad, f), h.dtype).at[:n].set(h),
                NamedSharding(mesh, P("data")))
            pallas_impl = ("pallas" if jax.default_backend() == "tpu"
                           else "pallas_interpret")
            for tag, builder in (
                    ("windowed", lambda m, p:
                     graph_parallel.make_ring_spmm_windowed_gspmd(m, p)),
                    ("windowed_pallas", lambda m, p:
                     graph_parallel.make_ring_spmm_windowed_pallas_gspmd(
                         m, p, impl=pallas_impl)),
                    ("banded", lambda m, p:
                     graph_parallel.make_banded_spmm_gspmd(m, p)),
                    ("banded_pallas", lambda m, p:
                     graph_parallel.make_banded_spmm_pallas_gspmd(
                         m, p, impl=pallas_impl))):
                ring = builder(mesh, part)
                t = bench_chain(
                    lambda hp, *data: ring.run(hp, *data).astype(hp.dtype),
                    h_pad, data=ring.prepare())
                rate = e_geo / t
                eff = rate / (base_rate * d)
                print(json.dumps({
                    "metric": f"spmm_ring_{tag}_{d}dev",
                    "value": round(rate / 1e9, 4), "unit": "Gedges/s",
                    "vs_baseline": round(rate / base_rate, 3),
                }) + f"  # scaling efficiency {eff:.1%}")
            comm = part.comm_bytes_per_device(f, h.dtype.itemsize)
            print(f"# D={d} comm/device/aggregation: full-chunk ring "
                  f"{comm['full_chunk_ring'] / 1e6:.2f} MB vs banded "
                  f"{comm['banded'] / 1e6:.3f} MB "
                  f"({comm['ratio']:.0f}x less); band widths "
                  f"{[part.band_width[s] for s in range(d)]} rows, "
                  f"step edges {list(part.step_edges)}")
            d *= 2


if __name__ == "__main__":
    main()
