"""Tests: multi-chip edge-partitioned SpMM (psum + ring halo exchange)."""

import jax
import jax.numpy as jnp
import numpy as np

from gnnra_tpu import graph as graph_lib
from gnnra_tpu.ops import spmm
from gnnra_tpu.parallel import graph_parallel, mesh as mesh_lib


def test_partitioned_spmm_matches_oracle():
    g = graph_lib.random_graph(jax.random.PRNGKey(0), 500, 4000)
    m = mesh_lib.make_mesh()
    shards = [graph_lib.block_by_receiver(s, r_block=128, e_block=256)
              for s in graph_lib.partition_edges(g, 8)]
    op = graph_parallel.make_partitioned_spmm(m, shards, g.num_nodes)
    h = jax.random.normal(jax.random.PRNGKey(1), (500, 32))
    got = np.asarray(op(h))
    want = np.asarray(spmm.spmm_coo(h, g))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ring_spmm_matches_oracle():
    n, e, f = 700, 5000, 16
    g = graph_lib.random_graph(jax.random.PRNGKey(2), n, e)
    m = mesh_lib.make_mesh()
    part = graph_parallel.partition_for_ring(g, num_devices=8, r_block=128)
    n_pad = part.num_devices * part.nodes_per_device
    op = graph_parallel.make_ring_spmm(m, part, f)
    h = jax.random.normal(jax.random.PRNGKey(3), (n, f))
    h_pad = jnp.zeros((n_pad, f)).at[:n].set(h)
    got = np.asarray(op(h_pad))[:n]
    want = np.asarray(spmm.spmm_coo(h, g))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ring_spmm_pallas_kernel_matches_oracle():
    """The composed ring + Pallas path (what real multi-chip runs): the
    shard_map ring with the Pallas segment-reduce kernel in interpret mode
    (Pallas-TPU semantics executed on CPU) against the segment-sum oracle."""
    n, e, f = 600, 4000, 16
    g = graph_lib.random_graph(jax.random.PRNGKey(5), n, e)
    m = mesh_lib.make_mesh()
    part = graph_parallel.partition_for_ring(g, num_devices=8, r_block=128)
    n_pad = part.num_devices * part.nodes_per_device
    op = graph_parallel.make_ring_spmm(m, part, f, impl="pallas_interpret")
    h = jax.random.normal(jax.random.PRNGKey(6), (n, f))
    h_pad = jnp.zeros((n_pad, f)).at[:n].set(h)
    got = np.asarray(op(h_pad))[:n]
    want = np.asarray(spmm.spmm_coo(h, g))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ring_partition_preserves_all_edges():
    g = graph_lib.random_graph(jax.random.PRNGKey(4), 300, 2000)
    part = graph_parallel.partition_for_ring(g, num_devices=4, r_block=64)
    w = np.asarray(part.weights)
    assert (w != 0).sum() == 2000


def test_ring_spmm_gspmd_matches_oracle():
    """GSPMD ring (production multi-chip path: batch-sharded gather +
    roll->collective-permute) == segment-sum oracle on the 8-device mesh."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from gnnra_tpu import graph as graph_lib
    from gnnra_tpu.ops import spmm
    from gnnra_tpu.parallel import graph_parallel

    m = Mesh(np.array(jax.devices()[:8]), ("data",))
    n, e, f = 1024, 8000, 16
    g = graph_lib.random_graph_host(5, n, e, weighted=True)
    part = graph_parallel.partition_for_ring(g, num_devices=8, r_block=32)
    n_pad = part.num_devices * part.nodes_per_device
    h = jax.random.normal(jax.random.PRNGKey(1), (n, f))
    h_pad = jnp.zeros((n_pad, f)).at[:n].set(h)
    ring = graph_parallel.make_ring_spmm_gspmd(m, part)
    out = np.asarray(ring(h_pad))[:n]
    want = np.asarray(spmm.spmm_coo(h, g))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_ring_spmm_windowed_gspmd_matches_oracle():
    """Ring x windowed composition (round 4): the GSPMD ring whose local
    stage is the dense-window einsum over compact per-step block lists ==
    segment-sum oracle, on the geometric topology it is built for."""
    from jax.sharding import Mesh

    m = Mesh(np.array(jax.devices()[:8]), ("data",))
    n, f = 2000, 16
    _, g = graph_lib.geometric_interference_graph(0, n, target_degree=8)
    gb, _ = graph_lib.reorder_nodes(g, "bfs")
    part = graph_parallel.partition_for_ring_windowed(
        gb, num_devices=8, r_block=32, dtype=jnp.float32)
    n_pad = part.num_devices * part.nodes_per_device
    h = jax.random.normal(jax.random.PRNGKey(1), (n, f))
    h_pad = jnp.zeros((n_pad, f)).at[:n].set(h)
    ring = graph_parallel.make_ring_spmm_windowed_gspmd(m, part)
    out = np.asarray(ring(h_pad))[:n]
    want = np.asarray(spmm.spmm_coo(h, gb))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_ring_windowed_weighted_graph_and_single_device():
    """Weighted edges + D=1 degenerate ring (pure windowed local stage)."""
    from jax.sharding import Mesh

    n, f = 900, 8
    _, g = graph_lib.geometric_interference_graph(3, n, target_degree=6)
    g = graph_lib.COOGraph(
        senders=g.senders, receivers=g.receivers,
        weights=jax.random.uniform(jax.random.PRNGKey(7), (g.num_edges,)),
        num_nodes=n)
    gb, _ = graph_lib.reorder_nodes(g, "bfs")
    h = jax.random.normal(jax.random.PRNGKey(2), (n, f))
    want = np.asarray(spmm.spmm_coo(h, gb))
    for d in (1, 4):
        m = Mesh(np.array(jax.devices()[:d]), ("data",))
        part = graph_parallel.partition_for_ring_windowed(
            gb, num_devices=d, r_block=32, dtype=jnp.float32)
        n_pad = part.num_devices * part.nodes_per_device
        h_pad = jnp.zeros((n_pad, f)).at[:n].set(h)
        ring = graph_parallel.make_ring_spmm_windowed_gspmd(m, part)
        out = np.asarray(ring(h_pad))[:n]
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_ring_windowed_partition_preserves_all_edges():
    _, g = graph_lib.geometric_interference_graph(1, 600, target_degree=6)
    gb, _ = graph_lib.reorder_nodes(g, "bfs")
    part = graph_parallel.partition_for_ring_windowed(
        gb, num_devices=4, r_block=32, dtype=jnp.float32)
    total = sum(float(np.abs(np.asarray(a)).sum()) for a in part.a_dense)
    assert total == g.num_edges          # unit weights, no loss, no dup


def test_banded_spmm_matches_oracle():
    """Round-5 boundary-band halo exchange: both the jnp (differentiable)
    and Pallas (custom_partitioning) banded builders == segment-sum
    oracle at D in {1, 4, 8}, weighted edges."""
    from jax.sharding import Mesh

    n, f = 2000, 16
    _, g = graph_lib.geometric_interference_graph(0, n, target_degree=8)
    g = graph_lib.COOGraph(
        senders=g.senders, receivers=g.receivers,
        weights=jax.random.uniform(jax.random.PRNGKey(9), (g.num_edges,)),
        num_nodes=n)
    gb, _ = graph_lib.reorder_nodes(g, "bfs")
    h = jax.random.normal(jax.random.PRNGKey(1), (n, f))
    want = np.asarray(spmm.spmm_coo(h, gb))
    for d in (1, 4, 8):
        m = Mesh(np.array(jax.devices()[:d]), ("data",))
        part = graph_parallel.partition_for_ring_windowed(
            gb, num_devices=d, r_block=32, dtype=jnp.float32)
        n_pad = part.num_devices * part.nodes_per_device
        h_pad = jnp.zeros((n_pad, f)).at[:n].set(h)
        banded = graph_parallel.make_banded_spmm_gspmd(m, part)
        out = np.asarray(banded(h_pad))[:n]
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)
        bp = graph_parallel.make_banded_spmm_pallas_gspmd(
            m, part, impl="pallas_interpret")
        outp = np.asarray(bp(h_pad))[:n]
        np.testing.assert_allclose(outp, want, rtol=1e-4, atol=1e-4)


def test_banded_spmm_comm_is_bands_not_chunks():
    """The banded exchange's comm accounting: only nonempty steps > 0
    move data, and each moves band_width rows instead of the full chunk.
    On a BFS-ordered geometric graph split 8 ways, interior steps carry
    zero edges and are dropped from the program."""
    _, g = graph_lib.geometric_interference_graph(1, 2000, target_degree=6)
    gb, _ = graph_lib.reorder_nodes(g, "bfs")
    part = graph_parallel.partition_for_ring_windowed(
        gb, num_devices=8, r_block=32, dtype=jnp.float32)
    assert sum(part.step_edges) == gb.num_edges
    # adjacent-chunk steps have edges; deep interior steps must be empty
    assert part.step_edges[0] > 0
    interior = [part.step_edges[s] for s in range(3, 6)]
    assert sum(interior) == 0
    comm = part.comm_bytes_per_device(16, 4)
    assert comm["banded"] < comm["full_chunk_ring"]
    # live steps drop the empty ones
    from jax.sharding import Mesh
    m = Mesh(np.array(jax.devices()[:8]), ("data",))
    banded = graph_parallel.make_banded_spmm_gspmd(m, part)
    assert all(part.step_edges[s] > 0 or s == 0
               for s in banded.live_steps)
    assert len(banded.live_steps) < part.num_devices


def test_banded_spmm_feature_major_matches_oracle():
    """Round-5 narrow-F multi-chip composition: the banded exchange with
    FEATURE-MAJOR tiles (windowed_t local stage — the picker's kernel
    for the model's own F=16) == oracle at D in {1, 4, 8}."""
    from jax.sharding import Mesh

    n, f = 2000, 16
    _, g = graph_lib.geometric_interference_graph(0, n, target_degree=8)
    gb, _ = graph_lib.reorder_nodes(g, "bfs")
    h = jax.random.normal(jax.random.PRNGKey(1), (n, f))
    want = np.asarray(spmm.spmm_coo(h, gb))
    for d in (1, 4, 8):
        m = Mesh(np.array(jax.devices()[:d]), ("data",))
        part = graph_parallel.partition_for_ring_windowed(
            gb, num_devices=d, r_block=32, dtype=jnp.float32,
            feature_major=True)
        assert part.feature_major
        n_pad = part.num_devices * part.nodes_per_device
        h_pad = jnp.zeros((n_pad, f)).at[:n].set(h)
        banded = graph_parallel.make_banded_spmm_gspmd(m, part)
        np.testing.assert_allclose(
            np.asarray(banded(h_pad))[:n], want, rtol=1e-4, atol=1e-4)
        bp = graph_parallel.make_banded_spmm_pallas_gspmd(
            m, part, impl="pallas_interpret")
        np.testing.assert_allclose(
            np.asarray(bp(h_pad))[:n], want, rtol=1e-4, atol=1e-4)


def test_banded_spmm_hlo_permutes_bands_not_chunks():
    """Compiler-level evidence for the comm claim: the compiled banded
    program's collective-permutes carry [1, band_width, F] tensors, one
    per live cross-chunk step — never the full [1, per, F] chunk, and
    none for the dropped zero-edge steps."""
    import re

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    _, g = graph_lib.geometric_interference_graph(0, 2000, target_degree=8)
    gb, _ = graph_lib.reorder_nodes(g, "bfs")
    d = 8
    part = graph_parallel.partition_for_ring_windowed(
        gb, num_devices=d, r_block=32, dtype=jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:d]), ("data",))
    banded = graph_parallel.make_banded_spmm_gspmd(mesh, part)
    args = banded.prepare()
    n_pad = d * part.nodes_per_device
    h = jax.device_put(jnp.zeros((n_pad, 16)),
                       NamedSharding(mesh, P("data")))
    txt = banded.run.lower(h, *args).compile().as_text()
    cp_types = re.findall(r"= (\S+) collective-permute\(", txt)
    live_comm = [s for s in banded.live_steps if s > 0]
    assert len(cp_types) == len(live_comm), (cp_types, banded.live_steps)
    per = part.nodes_per_device
    got_rows = sorted(int(t.split("[")[1].split(",")[1]) for t in cp_types)
    want_rows = sorted(part.band_width[s] for s in live_comm)
    assert got_rows == want_rows, (got_rows, want_rows)
    assert all(r < per for r in got_rows)


def test_banded_spmm_gradient_matches_coo():
    """The banded jnp builder is the TRAINING aggregation
    (sparse_spmd.make_sparse_spmd_train_step): its gradient w.r.t. the
    features must equal the segment-sum oracle's (the band-gather
    cotangent scatters back into the resident chunk; the roll cotangent
    is the reverse roll)."""
    from jax.sharding import Mesh

    n, f = 1200, 8
    _, g = graph_lib.geometric_interference_graph(2, n, target_degree=6)
    gb, _ = graph_lib.reorder_nodes(g, "bfs")
    part = graph_parallel.partition_for_ring_windowed(
        gb, num_devices=4, r_block=32, dtype=jnp.float32)
    m = Mesh(np.array(jax.devices()[:4]), ("data",))
    n_pad = part.num_devices * part.nodes_per_device
    banded = graph_parallel.make_banded_spmm_gspmd(m, part)
    args = banded.prepare()
    h = jax.random.normal(jax.random.PRNGKey(3), (n_pad, f))
    probe = jax.random.normal(jax.random.PRNGKey(4), (n_pad, f))

    def loss_banded(x):
        return jnp.sum(banded.run(x, *args) * probe)

    g_pad = graph_lib.COOGraph(senders=gb.senders, receivers=gb.receivers,
                               weights=gb.weights, num_nodes=n_pad)

    def loss_coo(x):
        return jnp.sum(spmm.spmm_coo(x, g_pad) * probe)

    got = np.asarray(jax.grad(loss_banded)(h))
    want = np.asarray(jax.grad(loss_coo)(h))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ring_windowed_pallas_gspmd_matches_oracle():
    """Round-4 production multi-chip path: the Pallas windowed local stage
    under custom_partitioning (interpret mode on CPU) == oracle."""
    from jax.sharding import Mesh

    n, f = 2000, 16
    _, g = graph_lib.geometric_interference_graph(0, n, target_degree=8)
    gb, _ = graph_lib.reorder_nodes(g, "bfs")
    h = jax.random.normal(jax.random.PRNGKey(1), (n, f))
    want = np.asarray(spmm.spmm_coo(h, gb))
    for d in (1, 8):
        m = Mesh(np.array(jax.devices()[:d]), ("data",))
        part = graph_parallel.partition_for_ring_windowed(
            gb, num_devices=d, r_block=32, dtype=jnp.float32)
        n_pad = part.num_devices * part.nodes_per_device
        h_pad = jnp.zeros((n_pad, f)).at[:n].set(h)
        ring = graph_parallel.make_ring_spmm_windowed_pallas_gspmd(
            m, part, impl="pallas_interpret")
        out = np.asarray(ring(h_pad))[:n]
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)
