"""Multi-device SpMM scaling benchmark (BASELINE config 5 harness).

Measures edges/s of the ring halo-exchange SpMM at 1, 2, 4, ... devices on
whatever mesh is available and reports scaling efficiency vs the 1-device
blocked kernel. On real multi-chip hardware the ≥80% 1→4-host target is
measured here; on a single chip / virtual CPU devices the numbers are
functional-only (noted in the output).

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


def bench_chain(op, h, iters=10):
    """Serialized-chain timing with forced execution (the runtime can elide
    dispatches whose results are never transferred — see
    benchmarks/spmm_bench.py::bench for the full discipline)."""
    @jax.jit
    def loop(h):
        def body(_, h):
            out = op(h)
            return h.at[0, 0].add(out.ravel()[0] * 1e-3)
        return jax.lax.fori_loop(0, iters, body, h)

    h = loop(h)
    float(h.ravel()[0])                  # compile + warm + force
    t0 = time.perf_counter()
    h = loop(h)
    float(h.ravel()[0])                  # scalar pull forces the chain
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--nodes", type=int, default=100_000)
    parser.add_argument("--edges", type=int, default=1_000_000)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--impl", default="pallas",
                        help="'pallas' on TPU, 'jnp' on CPU meshes")
    args = parser.parse_args(argv)

    from gnnra_tpu import graph as graph_lib
    from gnnra_tpu.ops import spmm
    from gnnra_tpu.parallel import graph_parallel, mesh as mesh_lib

    n, e, f = args.nodes, args.edges, args.dim
    g = graph_lib.random_graph_host(0, n, e)
    n_dev_all = jax.device_count()
    print(f"# backend={jax.default_backend()} devices={n_dev_all} "
          f"(virtual-device numbers are functional-only)")

    # 1-device baseline: blocked kernel
    blocked = graph_lib.block_by_receiver(g, r_block=128)
    h = jax.random.normal(jax.random.PRNGKey(1), (n, f))
    t1 = bench_chain(lambda h: spmm.spmm_blocked(h, blocked, impl=args.impl),
                     h)
    base_rate = e / t1
    print(json.dumps({"metric": "spmm_1dev", "value": round(base_rate / 1e9, 4),
                      "unit": "Gedges/s", "vs_baseline": 1.0}))

    d = 2
    while d <= n_dev_all:
        mesh = mesh_lib.make_mesh((d,), ("data",), devices=jax.devices()[:d])
        part = graph_parallel.partition_for_ring(g, num_devices=d,
                                                 r_block=128)
        n_pad = part.num_devices * part.nodes_per_device
        ring = graph_parallel.make_ring_spmm(mesh, part, f, impl=args.impl)
        h_pad = jnp.zeros((n_pad, f)).at[:n].set(h)
        t = bench_chain(lambda hp: ring(hp), h_pad)
        rate = e / t
        eff = rate / (base_rate * d)
        print(json.dumps({
            "metric": f"spmm_ring_{d}dev", "value": round(rate / 1e9, 4),
            "unit": "Gedges/s",
            "vs_baseline": round(rate / base_rate, 3),
        }) + f"  # scaling efficiency {eff:.1%}")
        d *= 2


if __name__ == "__main__":
    main()
