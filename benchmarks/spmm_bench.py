"""SpMM/SDDMM kernel benchmark (BASELINE configs 4-5).

Reports edges/s for forward and fwd+bwd at the synthetic 100k-node /
1M-edge scale, Pallas vs XLA segment-sum, plus the ring-partitioned
multi-chip path when more than one device is present.

Usage: python benchmarks/spmm_bench.py [--nodes N] [--edges E] [--dim F]
Prints one JSON line per measurement.
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
import numpy as np


def bench(op, h, iters=20, data=()):
    """Time `op(h, *data)` serialized `iters` times inside ONE jitted
    fori_loop.

    Each iteration's input depends on the previous output through a single
    element, so executions cannot be elided, overlapped, or deduplicated by
    the runtime (repeated identical dispatches measured impossibly fast on
    the remote TPU runtime), while the chain itself adds only a one-element
    update. op's output may have any shape; only out.ravel()[0] feeds back.

    Large graph layouts go in `data` so they enter the program as runtime
    PARAMETERS — closing over them embeds hundreds of MB of constants in
    the HLO, which remote-compile transports reject (HTTP 413).

    Execution is forced by pulling ONE scalar of the result to host —
    on this remote runtime `block_until_ready` alone can return in ~0.1 ms
    with the program never actually executing (observed: 300+ "Gedges/s"
    from a 10M-edge SpMM), regardless of whether the input buffer or its
    contents differ call-to-call. A device->host transfer of a value that
    depends on the whole serialized chain cannot be faked. The timed call
    also takes the warm-up call's output as its input (fresh buffer, fresh
    contents) so no dispatch-level cache can key-match it.

    Round-4 fix: the per-call fixed cost (dispatch + one host round trip
    over the TPU tunnel) varies 0.1..20 ms BETWEEN SESSIONS — and by
    several ms BETWEEN CALLS within a session. At 20 iterations a ~13 ms
    round trip inflated round-3's sub-ms kernels by up to 2x, and a
    naive single-sample two-point slope is noise-fragile the other way
    (one inflated t(n) sample produced impossible >1 TB/s rates). The
    discipline is therefore: runtime loop bound, the bound RAISED until
    one chain call runs >= 0.2 s of device work (so per-call noise is a
    few % at most), min-of-3 samples at n and 2n, and the per-iteration
    time is the slope (t(2n) - t(n)) / n — the fixed cost cancels and
    min() kills the one-sided RTT outliers.
    """

    @jax.jit
    def loop(h, n, *data):
        def body(_, h):
            out = op(h, *data)
            return h.at[0, 0].add(out.ravel()[0] * 1e-3)
        return jax.lax.fori_loop(0, n, body, h)

    def timed(h, n):
        t0 = time.perf_counter()
        h = loop(h, n, *data)
        float(h.ravel()[0])              # scalar pull forces the chain
        return time.perf_counter() - t0, h

    h = loop(h, iters, *data)
    float(h.ravel()[0])                  # compile + warm + force
    t1, h = timed(h, iters)
    while t1 < 0.2 and iters < 1 << 16:  # raise work >> per-call noise
        iters *= 4
        t1, h = timed(h, iters)
    t_n, t_2n = t1, None
    for _ in range(2):
        t, h = timed(h, iters)
        t_n = min(t_n, t)
    for _ in range(3):
        t, h = timed(h, 2 * iters)
        t_2n = t if t_2n is None else min(t_2n, t)
    if t_2n <= t_n:                      # noise floor: fall back to t_n
        return t_n / iters
    return (t_2n - t_n) / iters


def report(name, num_edges, seconds, baseline_seconds=None):
    rec = {"metric": name, "value": round(num_edges / seconds / 1e9, 4),
           "unit": "Gedges/s",
           "vs_baseline": (round(baseline_seconds / seconds, 3)
                           if baseline_seconds else 1.0)}
    print(json.dumps(rec))
    return rec


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--nodes", type=int, default=100_000)
    parser.add_argument("--edges", type=int, default=1_000_000)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--two-level-chunks", type=int, default=0,
                        help="also bench the sender-chunked two-level "
                        "layout with this many chunks (config-5 large-"
                        "table gather fix); 0 = skip")
    parser.add_argument("--r-block", type=int, default=256,
                        help="receiver-block rows; 256 measured optimal at "
                        "both 1M- and 10M-edge scale (docs/RESULTS.md)")
    parser.add_argument("--skip-xla-baseline", action="store_true",
                        help="skip the XLA segment-sum baselines (they are "
                        "O(10x) slower than the kernels; at 10M+ edges they "
                        "dominate the run)")
    args = parser.parse_args(argv)

    from gnnra_tpu import graph as graph_lib
    from gnnra_tpu.ops import spmm

    n, e, f = args.nodes, args.edges, args.dim
    g = graph_lib.random_graph_host(0, n, e)
    t0 = time.time()
    fwd_b = graph_lib.block_by_receiver(g, r_block=args.r_block)
    bwd_b = graph_lib.block_by_receiver(g.transpose(), r_block=args.r_block)
    print(f"# preprocess {time.time() - t0:.2f}s; blocks={fwd_b.num_blocks} "
          f"e_block={fwd_b.e_block} pad_overhead="
          f"{fwd_b.num_blocks * fwd_b.e_block / e - 1:.2%}")

    h = jax.random.normal(jax.random.PRNGKey(1), (n, f))
    g_dev = graph_lib.COOGraph(senders=jnp.asarray(g.senders),
                               receivers=jnp.asarray(g.receivers),
                               weights=jnp.asarray(g.weights),
                               num_nodes=g.num_nodes)

    t_x = (None if args.skip_xla_baseline else
           bench(lambda h: spmm.spmm_coo(h, g_dev), h, iters=args.iters))
    t_p = bench(lambda h: spmm.spmm_blocked(h, fwd_b, impl="pallas"), h,
                iters=args.iters)
    report("spmm_fwd_pallas", e, t_p, baseline_seconds=t_x)
    if t_x is not None:
        report("spmm_fwd_xla_segsum", e, t_x)

    op = spmm.make_spmm(fwd_b, bwd_b, impl="pallas")
    pallas_fb = jax.grad(lambda h: jnp.sum(op(h) * h))
    xla_fb = jax.grad(lambda h: jnp.sum(spmm.spmm_coo(h, g_dev) * h))
    t_xg = (None if args.skip_xla_baseline else
            bench(xla_fb, h, iters=args.iters))
    t_pg = bench(pallas_fb, h, iters=args.iters)
    report("spmm_fwdbwd_pallas", e, t_pg, baseline_seconds=t_xg)
    if t_xg is not None:
        report("spmm_fwdbwd_xla_segsum", e, t_xg)

    t_s = bench(lambda h: spmm.sddmm_blocked(h, h, fwd_b, impl="pallas"), h,
                iters=args.iters)
    report("sddmm_pallas", e, t_s)

    # neighbor-sampled fixed-degree aggregation (BASELINE config 4 sampling)
    k = 16
    csr = graph_lib.to_csr(g)
    fd = jax.jit(graph_lib.sample_neighbors, static_argnums=2)(
        jax.random.PRNGKey(2), csr, k)
    t_fd = bench(lambda h: spmm.spmm_fixed_degree(h, fd), h,
                 iters=args.iters)
    report(f"spmm_sampled_k{k}_fwd", n * k, t_fd)
    fd_fb = jax.grad(lambda h: jnp.sum(spmm.spmm_fixed_degree(h, fd) * h))
    t_fdg = bench(fd_fb, h, iters=args.iters)
    report(f"spmm_sampled_k{k}_fwdbwd_xla_scatter", n * k, t_fdg)
    # blocked backward: 1-D weight scatter + full-transpose Pallas kernel
    sampled_op = spmm.make_spmm_sampled(bwd_b, impl="pallas")
    fd_fb_blk = jax.grad(lambda h, fd: jnp.sum(sampled_op(h, fd) * h),
                         argnums=0)
    t_fdgb = bench(fd_fb_blk, h, iters=args.iters, data=(fd,))
    report(f"spmm_sampled_k{k}_fwdbwd_blocked", n * k, t_fdgb,
           baseline_seconds=t_fdg)

    h16 = h.astype(jnp.bfloat16)
    t_p16 = bench(lambda h: spmm.spmm_blocked(h, fwd_b, impl="pallas"), h16,
                  iters=args.iters)
    report("spmm_fwd_pallas_bf16", e, t_p16, baseline_seconds=t_p)

    if args.two_level_chunks > 0:
        c = args.two_level_chunks
        t0 = time.time()
        tl_f = graph_lib.block_two_level(g, r_block=args.r_block,
                                         num_chunks=c)
        tl_b = graph_lib.block_two_level(g.transpose(),
                                         r_block=args.r_block, num_chunks=c)
        pad = tl_f.num_blocks * tl_f.num_chunks * tl_f.e_cell / e - 1
        print(f"# two-level preprocess {time.time() - t0:.2f}s; "
              f"chunks={c} e_cell={tl_f.e_cell} pad_overhead={pad:.2%}",
              flush=True)
        t_tl = bench(lambda h, tl: spmm.spmm_blocked(h, tl, impl="pallas"),
                     h, iters=args.iters, data=(tl_f,))
        report(f"spmm_fwd_pallas_2lvl_c{c}", e, t_tl, baseline_seconds=t_p)
        spmm_call = spmm.make_spmm_call(impl="pallas")
        tl_fb = jax.grad(lambda h, f_, b_: jnp.sum(spmm_call(h, f_, b_) * h),
                         argnums=0)
        t_tlg = bench(tl_fb, h, iters=args.iters, data=(tl_f, tl_b))
        report(f"spmm_fwdbwd_pallas_2lvl_c{c}", e, t_tlg,
               baseline_seconds=t_pg)
        t_tl16 = bench(lambda h, tl: spmm.spmm_blocked(h, tl, impl="pallas"),
                       h16, iters=args.iters, data=(tl_f,))
        report(f"spmm_fwd_pallas_2lvl_c{c}_bf16", e, t_tl16,
               baseline_seconds=t_p)

    # ring-program overhead at D=1: the GSPMD ring program on a single chip
    # vs the plain local kernel — the fixed cost the multi-host ring pays
    # before any communication wins. (The shard_map ring is NOT benched on
    # TPU: on this runtime every computation inside a shard_map body runs
    # ~20x slower than the identical jit'd computation — docs/RESULTS.md.)
    from gnnra_tpu.parallel import graph_parallel
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    m1 = Mesh(np.array(jax.devices()[:1]), ("data",))
    part1 = graph_parallel.partition_for_ring(g, num_devices=1,
                                              r_block=args.r_block)
    ring1 = graph_parallel.make_ring_spmm_gspmd(m1, part1)
    n_pad1 = part1.nodes_per_device
    sh1 = NamedSharding(m1, P("data"))
    h_pad1 = jax.device_put(
        jnp.zeros((n_pad1, f)).at[:n].set(h), sh1)
    t_r1 = bench(lambda hp: ring1(hp), h_pad1, iters=args.iters)
    report("spmm_ring_gspmd_1dev_overhead", e, t_r1, baseline_seconds=t_p)

    if jax.device_count() > 1:
        from gnnra_tpu.parallel import mesh as mesh_lib
        m = mesh_lib.make_mesh()
        d = m.devices.size
        part = graph_parallel.partition_for_ring(g, num_devices=d)
        n_pad = part.num_devices * part.nodes_per_device
        ring = graph_parallel.make_ring_spmm_gspmd(m, part)
        h_pad = jnp.zeros((n_pad, f)).at[:n].set(h)
        t_r = bench(lambda hp: ring(hp), h_pad, iters=args.iters)
        report(f"spmm_ring_gspmd_{d}dev", e, t_r, baseline_seconds=t_p)


if __name__ == "__main__":
    main()
