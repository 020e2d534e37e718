"""Tests: graph containers + blocked/Pallas SpMM + SDDMM vs segment-sum
oracles. Pallas runs in interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnra_tpu import graph as graph_lib
from gnnra_tpu.ops import spmm
from gnnra_tpu.experimental import paged as paged_lib


def make_graph(seed=0, n=200, e=1000, weighted=True):
    return graph_lib.random_graph(jax.random.PRNGKey(seed), n, e,
                                  weighted=weighted)


class TestGraph:
    def test_random_graph_shapes(self):
        g = make_graph()
        assert g.num_edges == 1000
        assert np.asarray(g.senders).max() < 200

    def test_transpose(self):
        g = make_graph()
        t = g.transpose()
        np.testing.assert_array_equal(np.asarray(t.senders),
                                      np.asarray(g.receivers))

    def test_from_dense_roundtrip(self):
        rng = np.random.RandomState(0)
        adj = (rng.rand(10, 10) < 0.3) * rng.rand(10, 10)
        g = graph_lib.from_dense_adjacency(adj)
        h = jnp.asarray(rng.randn(10, 4), jnp.float32)
        got = np.asarray(spmm.spmm_coo(h, g))
        want = np.asarray(h).T @ adj          # out[r] = sum_s adj[s,r] h[s]
        np.testing.assert_allclose(got, want.T, rtol=1e-4, atol=1e-5)

    def test_block_by_receiver_covers_all_edges(self):
        g = make_graph(n=300, e=2000)
        blocked = graph_lib.block_by_receiver(g, r_block=128)
        assert blocked.num_blocks == 3          # ceil(300/128)
        assert blocked.num_nodes_padded == 384
        # sum of nonzero weights equals edge count (weights>0 here)
        w = np.asarray(blocked.weights)
        assert (w > 0).sum() == 2000

    def test_partition_edges(self):
        g = make_graph(n=100, e=999)
        shards = graph_lib.partition_edges(g, 4)
        assert len(shards) == 4
        total = sum(int((np.asarray(s.weights) != 0).sum()) for s in shards)
        assert total == 999

    @pytest.mark.parametrize("impl", ["jnp", "pallas_interpret"])
    def test_sender_sorted_slots_preserve_spmm(self, impl):
        """Slot order within a block is free for the one-hot reduction;
        sorting by sender (the gather-locality optimization for config-5
        scale) must not change the SpMM result."""
        g = make_graph(seed=7, n=300, e=2000)
        blocked = graph_lib.block_by_receiver(g, r_block=128)
        sorted_bl = graph_lib.sort_block_slots_by_sender(blocked)
        s = np.asarray(sorted_bl.senders)
        assert (np.diff(s, axis=1) >= 0).all(), "senders not ascending"
        h = jax.random.normal(jax.random.PRNGKey(8), (300, 16))
        got = np.asarray(spmm.spmm_blocked(h, sorted_bl, impl=impl))
        want = np.asarray(spmm.spmm_coo(h, g))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("impl", ["jnp", "pallas_interpret"])
    @pytest.mark.parametrize("num_chunks", [1, 4, 7])
    def test_two_level_blocked_matches_oracle(self, impl, num_chunks):
        """Sender-chunked two-level layout (the config-5 large-table gather
        fix): identical SpMM result to the segment-sum oracle."""
        g = make_graph(seed=12, n=300, e=2500)
        tl = graph_lib.block_two_level(g, r_block=128, num_chunks=num_chunks)
        assert (np.asarray(tl.weights) != 0).sum() == 2500
        h = jax.random.normal(jax.random.PRNGKey(13), (300, 16))
        got = np.asarray(spmm.spmm_blocked(h, tl, impl=impl))
        want = np.asarray(spmm.spmm_coo(h, g))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_spmm_call_layouts_as_args_grad(self):
        """make_spmm_call passes layouts as runtime arguments (closing over
        them bakes 100s of MB of constants into the HLO — rejected by
        remote-compile transports at config-5 scale)."""
        g = make_graph(seed=21, n=200, e=1500)
        tl_f = graph_lib.block_two_level(g, r_block=64, num_chunks=4)
        tl_b = graph_lib.block_two_level(g.transpose(), r_block=64,
                                         num_chunks=4)
        h = jax.random.normal(jax.random.PRNGKey(22), (200, 8))
        call = spmm.make_spmm_call(impl="jnp")
        got = jax.jit(jax.grad(
            lambda h, f_, b_: jnp.sum(call(h, f_, b_) * h)))(h, tl_f, tl_b)
        bl_f = graph_lib.block_by_receiver(g, r_block=64)
        bl_b = graph_lib.block_by_receiver(g.transpose(), r_block=64)
        op = spmm.make_spmm(bl_f, bl_b, impl="jnp")
        want = jax.grad(lambda h: jnp.sum(op(h) * h))(h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_two_level_vjp_matches_single_level(self):
        g = make_graph(seed=14, n=200, e=1500)
        tl_f = graph_lib.block_two_level(g, r_block=64, num_chunks=4)
        tl_b = graph_lib.block_two_level(g.transpose(), r_block=64,
                                         num_chunks=4)
        bl_f = graph_lib.block_by_receiver(g, r_block=64)
        bl_b = graph_lib.block_by_receiver(g.transpose(), r_block=64)
        h = jax.random.normal(jax.random.PRNGKey(15), (200, 8))
        op_tl = spmm.make_spmm(tl_f, tl_b, impl="jnp")
        op_bl = spmm.make_spmm(bl_f, bl_b, impl="jnp")
        g_tl = jax.grad(lambda h: jnp.sum(op_tl(h) * h))(h)
        g_bl = jax.grad(lambda h: jnp.sum(op_bl(h) * h))(h)
        np.testing.assert_allclose(np.asarray(g_tl), np.asarray(g_bl),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("method", ["degree", "bfs"])
    def test_reorder_nodes_preserves_spmm(self, method):
        g = make_graph(seed=9, n=257, e=1500)
        new_g, perm = graph_lib.reorder_nodes(g, method=method)
        assert sorted(perm.tolist()) == list(range(257))
        inv = graph_lib.inverse_permutation(perm)
        h = jax.random.normal(jax.random.PRNGKey(10), (257, 8))
        out_new = np.asarray(spmm.spmm_coo(h[jnp.asarray(perm)], new_g))
        want = np.asarray(spmm.spmm_coo(h, g))
        np.testing.assert_allclose(out_new[inv], want, rtol=1e-4, atol=1e-4)

    def test_degree_reorder_sorts_hot_senders_first(self):
        g = make_graph(seed=11, n=100, e=2000)
        new_g, perm = graph_lib.reorder_nodes(g, method="degree")
        deg = np.bincount(np.asarray(new_g.senders), minlength=100)
        assert (np.diff(deg) <= 0).all(), "out-degree not descending"


class TestSpmmBlocked:
    @pytest.mark.parametrize("impl", ["jnp", "pallas_interpret"])
    def test_matches_segment_sum_oracle(self, impl):
        g = make_graph(seed=1, n=300, e=2000)
        blocked = graph_lib.block_by_receiver(g, r_block=128)
        h = jax.random.normal(jax.random.PRNGKey(2), (300, 64))
        got = np.asarray(spmm.spmm_blocked(h, blocked, impl=impl))
        want = np.asarray(spmm.spmm_coo(h, g))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_unweighted(self):
        g = make_graph(seed=3, n=150, e=600, weighted=False)
        blocked = graph_lib.block_by_receiver(g, r_block=128)
        h = jax.random.normal(jax.random.PRNGKey(4), (150, 32))
        got = np.asarray(spmm.spmm_blocked(h, blocked, impl="jnp"))
        want = np.asarray(spmm.spmm_coo(h, g))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("impl", ["jnp", "pallas_interpret"])
    def test_custom_vjp_matches_autodiff_oracle(self, impl):
        g = make_graph(seed=5, n=100, e=500)
        fwd_b = graph_lib.block_by_receiver(g, r_block=64)
        bwd_b = graph_lib.block_by_receiver(g.transpose(), r_block=64)
        op = spmm.make_spmm(fwd_b, bwd_b, impl=impl)
        h = jax.random.normal(jax.random.PRNGKey(6), (100, 16))

        def loss_ours(h):
            return jnp.sum(jnp.sin(op(h)))

        def loss_oracle(h):
            return jnp.sum(jnp.sin(spmm.spmm_coo(h, g)))

        np.testing.assert_allclose(float(loss_ours(h)),
                                   float(loss_oracle(h)), rtol=1e-4)
        g_ours = np.asarray(jax.grad(loss_ours)(h))
        g_want = np.asarray(jax.grad(loss_oracle)(h))
        np.testing.assert_allclose(g_ours, g_want, rtol=1e-3, atol=1e-4)

    def test_jit_compiles(self):
        g = make_graph(seed=7, n=128, e=512)
        fwd_b = graph_lib.block_by_receiver(g, r_block=128)
        bwd_b = graph_lib.block_by_receiver(g.transpose(), r_block=128)
        op = jax.jit(spmm.make_spmm(fwd_b, bwd_b, impl="jnp"))
        out = op(jnp.ones((128, 8)))
        assert out.shape == (128, 8)


class TestSddmm:
    @pytest.mark.parametrize("impl", ["jnp", "pallas_interpret"])
    def test_matches_oracle(self, impl):
        g = make_graph(seed=8, n=200, e=800)
        blocked = graph_lib.block_by_receiver(g, r_block=128)
        a = jax.random.normal(jax.random.PRNGKey(9), (200, 32))
        b = jax.random.normal(jax.random.PRNGKey(10), (200, 32))
        got = np.asarray(spmm.sddmm_blocked(a, b, blocked, impl=impl))
        # oracle on the blocked layout: score for each non-padding edge
        want_coo = np.asarray(spmm.sddmm_coo(a, b, g))
        # map: blocked edges are the COO edges sorted by receiver block
        recv = np.asarray(g.receivers)
        order = np.argsort(recv // 128, kind="stable")
        mask = np.asarray(blocked.weights) != 0
        np.testing.assert_allclose(got[mask], want_coo[order], rtol=1e-3,
                                   atol=1e-3)


class TestWeightedSpmm:
    @pytest.mark.parametrize("impl", ["jnp", "pallas_interpret"])
    def test_value_and_grads_match_autodiff_oracle(self, impl):
        g = make_graph(seed=20, n=150, e=700, weighted=True)
        fwd_b = graph_lib.block_by_receiver(g, r_block=64)
        bwd_b = graph_lib.block_by_receiver(g.transpose(), r_block=64)
        op = spmm.make_weighted_spmm(fwd_b, bwd_b, impl=impl)
        h = jax.random.normal(jax.random.PRNGKey(21), (150, 16))
        w = jnp.asarray(np.random.RandomState(22).rand(700), jnp.float32)

        def loss_ours(h, w):
            return jnp.sum(jnp.sin(op(h, w)))

        def loss_oracle(h, w):
            gg = graph_lib.COOGraph(senders=g.senders, receivers=g.receivers,
                                    weights=w, num_nodes=g.num_nodes)
            return jnp.sum(jnp.sin(spmm.spmm_coo(h, gg)))

        np.testing.assert_allclose(float(loss_ours(h, w)),
                                   float(loss_oracle(h, w)), rtol=1e-4)
        dh1, dw1 = jax.grad(loss_ours, argnums=(0, 1))(h, w)
        dh2, dw2 = jax.grad(loss_oracle, argnums=(0, 1))(h, w)
        np.testing.assert_allclose(np.asarray(dh1), np.asarray(dh2),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw2),
                                   rtol=1e-3, atol=1e-4)

    def test_edge_ids_layout(self):
        g = make_graph(seed=23, n=100, e=400)
        b = graph_lib.block_by_receiver(g, r_block=64)
        ids = np.asarray(b.edge_ids)
        mask = np.asarray(b.weights) != 0
        # real slots carry each original edge exactly once
        real = np.sort(ids[mask])
        np.testing.assert_array_equal(real, np.arange(400))
        # padding slots carry the sentinel id E
        assert np.all(ids[~mask] == 400)


class TestNeighborSampling:
    """CSR + uniform-K sampling + fixed-degree SpMM (BASELINE config 4)."""

    def test_csr_roundtrip(self):
        g = make_graph(seed=30, n=120, e=600)
        csr = graph_lib.to_csr(g)
        offs = np.asarray(csr.offsets)
        send = np.asarray(csr.senders)
        w = np.asarray(csr.weights)
        # every CSR row holds exactly the original in-edges of that node
        for r in (0, 5, 77, 119):
            row = sorted(zip(send[offs[r]:offs[r + 1]],
                             w[offs[r]:offs[r + 1]]))
            mask = np.asarray(g.receivers) == r
            orig = sorted(zip(np.asarray(g.senders)[mask],
                              np.asarray(g.weights)[mask]))
            assert row == orig

    def test_sampled_edges_are_real_edges(self):
        g = make_graph(seed=31, n=80, e=400, weighted=False)
        csr = graph_lib.to_csr(g)
        fd = jax.jit(graph_lib.sample_neighbors,
                     static_argnums=2)(jax.random.PRNGKey(0), csr, 8)
        send = np.asarray(fd.senders)
        w = np.asarray(fd.weights)
        offs = np.asarray(csr.offsets)
        csr_send = np.asarray(csr.senders)
        degs = offs[1:] - offs[:-1]
        for r in range(80):
            nbrs = set(csr_send[offs[r]:offs[r + 1]])
            if degs[r] == 0:
                assert np.all(w[r] == 0)
            else:
                assert set(send[r]) <= nbrs
                # unbiased importance scaling: w = d / K for unit weights
                np.testing.assert_allclose(w[r], degs[r] / 8, rtol=1e-6)

    def test_fixed_degree_spmm_full_neighborhood_exact(self):
        # K large enough to observe: sampling with replacement is still an
        # unbiased estimator; but with K == d and distinct draws impossible
        # to force, instead check the deterministic contract directly: a
        # hand-built FixedDegreeGraph must reproduce the dense aggregation.
        g = make_graph(seed=32, n=6, e=18, weighted=True)
        dense = np.zeros((6, 6), np.float32)
        for s, r, w in zip(np.asarray(g.senders), np.asarray(g.receivers),
                           np.asarray(g.weights)):
            dense[s, r] += w
        # build the K=6 fixed-degree layout: every node attends all nodes
        senders = jnp.broadcast_to(jnp.arange(6, dtype=jnp.int32), (6, 6))
        weights = jnp.asarray(dense.T)                  # [r, s] = w(s->r)
        fd = graph_lib.FixedDegreeGraph(
            senders=senders, weights=weights,
            edge_ids=jnp.zeros((6, 6), jnp.int32), num_nodes=6)
        h = jax.random.normal(jax.random.PRNGKey(3), (6, 16))
        got = spmm.spmm_fixed_degree(h, fd)
        want = spmm.spmm_coo(h, g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_sampled_spmm_unbiased(self):
        g = make_graph(seed=33, n=100, e=1500, weighted=True)
        csr = graph_lib.to_csr(g)
        h = jax.random.normal(jax.random.PRNGKey(4), (100, 8))

        @jax.jit
        def one(key):
            fd = graph_lib.sample_neighbors(key, csr, 4)
            return spmm.spmm_fixed_degree(h, fd)

        keys = jax.random.split(jax.random.PRNGKey(5), 8000)
        est = jnp.mean(jax.vmap(one)(keys), axis=0)
        want = spmm.spmm_coo(h, g)
        # Monte-Carlo mean converges to the exact aggregation
        err = float(jnp.max(jnp.abs(est - want))
                    / (jnp.max(jnp.abs(want)) + 1e-9))
        assert err < 0.05, err

    def test_fixed_degree_grads(self):
        g = make_graph(seed=34, n=50, e=300, weighted=True)
        csr = graph_lib.to_csr(g)
        fd = graph_lib.sample_neighbors(jax.random.PRNGKey(6), csr, 5)
        h = jax.random.normal(jax.random.PRNGKey(7), (50, 8))

        def loss(h, w):
            fd2 = graph_lib.FixedDegreeGraph(senders=fd.senders, weights=w,
                                             edge_ids=fd.edge_ids,
                                             num_nodes=50)
            return jnp.sum(jnp.sin(spmm.spmm_fixed_degree(h, fd2)))

        dh, dw = jax.grad(loss, argnums=(0, 1))(h, fd.weights)
        # numeric check on a few coordinates
        eps = 1e-3
        for idx in [(0, 0), (13, 3), (49, 7)]:
            hp = h.at[idx].add(eps)
            hm = h.at[idx].add(-eps)
            num = (loss(hp, fd.weights) - loss(hm, fd.weights)) / (2 * eps)
            np.testing.assert_allclose(float(dh[idx]), float(num),
                                       rtol=2e-2, atol=1e-3)


def geo_bfs_graph(seed=0, n=2000, deg=8.0, weighted=False):
    _, g = graph_lib.geometric_interference_graph(seed, n, target_degree=deg)
    if weighted:
        g = graph_lib.COOGraph(
            senders=g.senders, receivers=g.receivers,
            weights=jax.random.uniform(jax.random.PRNGKey(seed + 1),
                                       (g.num_edges,)),
            num_nodes=g.num_nodes)
    gb, _ = graph_lib.reorder_nodes(g, "bfs")
    return gb


class TestGeometricGraph:
    def test_generator_properties(self):
        pos, g = graph_lib.geometric_interference_graph(0, 1000,
                                                        target_degree=8)
        assert pos.shape == (1000, 2)
        deg = g.num_edges / 1000
        assert 4 < deg < 16            # one adjustment pass lands near target
        s = np.asarray(g.senders)
        r = np.asarray(g.receivers)
        assert np.all(s != r)
        # undirected: every edge present in both directions
        fwd = set(zip(s.tolist(), r.tolist()))
        assert all((b, a) in fwd for a, b in list(fwd)[:100])

    def test_bfs_narrows_windows(self):
        g = geo_bfs_graph()
        s = np.asarray(g.senders)
        r = np.asarray(g.receivers)
        bid = r // 128
        spans = []
        for b in range(g.num_nodes // 128):
            m = bid == b
            if m.any():
                spans.append(s[m].max() - s[m].min())
        # BFS ordering keeps sender windows narrow (vs ~N for random order)
        assert np.median(spans) < g.num_nodes // 4


class TestPagedSpmm:
    @pytest.mark.parametrize("weighted", [False, True])
    def test_matches_oracle(self, weighted):
        g = geo_bfs_graph(weighted=weighted)
        paged = paged_lib.page_cells(g, r_block=128, chunk=128, page=256)
        h = jax.random.normal(jax.random.PRNGKey(2), (g.num_nodes, 64))
        want = np.asarray(spmm.spmm_coo(h, g))
        got = np.asarray(paged_lib.spmm_paged(h, paged, impl="jnp"))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        got_k = np.asarray(paged_lib.spmm_paged(h, paged,
                                           impl="pallas_interpret"))
        np.testing.assert_allclose(got_k, want, rtol=1e-4, atol=1e-4)

    def test_every_block_visited(self):
        # a graph with an edge-free receiver block still zero-fills its rows
        g = graph_lib.COOGraph(
            senders=jnp.asarray([0, 1], jnp.int32),
            receivers=jnp.asarray([1, 0], jnp.int32),
            weights=jnp.ones((2,)), num_nodes=300)
        paged = paged_lib.page_cells(g, r_block=128, chunk=128, page=8)
        h = jnp.ones((300, 8))
        out = np.asarray(paged_lib.spmm_paged(h, paged, impl="jnp"))
        assert out.shape == (300, 8)
        np.testing.assert_allclose(out[128:], 0.0)

    def test_grad_matches_segment_sum(self):
        g = geo_bfs_graph(weighted=True)
        fwd = paged_lib.page_cells(g, 128, 128, 256)
        bwd = paged_lib.page_cells(g.transpose(), 128, 128, 256)
        op = paged_lib.make_spmm_paged(fwd, bwd, impl="jnp")
        h = jax.random.normal(jax.random.PRNGKey(3), (g.num_nodes, 32))
        gout = jax.random.normal(jax.random.PRNGKey(4), (g.num_nodes, 32))
        dh = jax.vjp(op, h)[1](gout)[0]
        dh_ref = jax.vjp(lambda x: spmm.spmm_coo(x, g), h)[1](gout)[0]
        np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_ref),
                                   rtol=1e-4, atol=1e-4)


class TestWindowedDenseSpmm:
    @pytest.mark.parametrize("weighted", [False, True])
    def test_matches_oracle(self, weighted):
        g = geo_bfs_graph(weighted=weighted)
        wd = graph_lib.window_dense(g, r_block=128, window=512,
                                    dtype=jnp.float32)
        h = jax.random.normal(jax.random.PRNGKey(2), (g.num_nodes, 64))
        want = np.asarray(spmm.spmm_coo(h, g))
        got = np.asarray(spmm.spmm_windowed(h, wd, impl="jnp"))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        got_k = np.asarray(spmm.spmm_windowed(h, wd,
                                              impl="pallas_interpret"))
        np.testing.assert_allclose(got_k, want, rtol=1e-4, atol=1e-4)

    def test_window_overflow_raises(self):
        _, g = graph_lib.geometric_interference_graph(0, 2000,
                                                      target_degree=8)
        with pytest.raises(ValueError, match="span"):
            graph_lib.window_dense(g, r_block=128, window=512)

    def test_duplicate_edges_accumulate(self):
        g = graph_lib.COOGraph(
            senders=jnp.asarray([3, 3, 5], jnp.int32),
            receivers=jnp.asarray([7, 7, 7], jnp.int32),
            weights=jnp.asarray([2.0, 0.5, 1.0]), num_nodes=16)
        wd = graph_lib.window_dense(g, r_block=8, window=16,
                                    dtype=jnp.float32)
        h = jnp.eye(16)
        out = np.asarray(spmm.spmm_windowed(h, wd, impl="jnp"))
        assert out[7, 3] == pytest.approx(2.5)
        assert out[7, 5] == pytest.approx(1.0)

    def test_non_multiple_of_8_node_count(self):
        # Advisor round-3 repro: with n % 8 != 0 the tail block's window
        # clamp (against raw n, aligned down to 8) could shift the start
        # BELOW the block's aligned min sender and break s_local < window
        # — an IndexError in preprocessing. The clamp now uses n_padded.
        # n=1003: old clamp = ((1003-128)//8)*8 = 872; a tail block with
        # senders in [880, 1002] (span 123 <= 128, aligned min 880) was
        # forced to start 872, putting sender 1002 at slot 130 >= 128.
        n, r_block, window = 1003, 128, 128
        senders = np.array([0, 128, 256, 384, 512, 640, 768,
                            880, 1002, 1002], np.int32)
        receivers = np.array([0, 128, 256, 384, 512, 640, 768,
                              1000, 896, 1002], np.int32)
        g = graph_lib.COOGraph(
            senders=jnp.asarray(senders), receivers=jnp.asarray(receivers),
            weights=jnp.ones((senders.shape[0],)), num_nodes=n)
        wd = graph_lib.window_dense(g, r_block=r_block, window=window,
                                    dtype=jnp.float32)
        h = jax.random.normal(jax.random.PRNGKey(5), (n, 8))
        got = np.asarray(spmm.spmm_windowed(h, wd, impl="jnp"))
        want = np.asarray(spmm.spmm_coo(h, g))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_grad_matches_segment_sum(self):
        g = geo_bfs_graph(weighted=True)
        fwd = graph_lib.window_dense(g, 128, 512, dtype=jnp.float32)
        bwd = graph_lib.window_dense(g.transpose(), 128, 512,
                                     dtype=jnp.float32)
        op = spmm.make_spmm_windowed(fwd, bwd, impl="jnp")
        h = jax.random.normal(jax.random.PRNGKey(3), (g.num_nodes, 32))
        gout = jax.random.normal(jax.random.PRNGKey(4), (g.num_nodes, 32))
        dh = jax.vjp(op, h)[1](gout)[0]
        dh_ref = jax.vjp(lambda x: spmm.spmm_coo(x, g), h)[1](gout)[0]
        np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("impl", ["jnp", "pallas_interpret"])
    @pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16, jnp.int8])
    def test_windowed_t_matches_oracle(self, impl, dt):
        # round-5 narrow-F feature-major layout: window slices the lane
        # axis (all real data at F=16), A tiles transposed [W, R]
        g = geo_bfs_graph(weighted=(dt == jnp.float32))
        wdt = graph_lib.window_dense_t(g, r_block=128, dtype=dt)
        assert int(wdt.w_start[0]) % 128 == 0
        h = jax.random.normal(jax.random.PRNGKey(2), (g.num_nodes, 16))
        h = h.astype(jnp.float32 if dt == jnp.float32 else jnp.bfloat16)
        want = np.asarray(spmm.spmm_coo(h.astype(jnp.float32), g))
        got = np.asarray(spmm.spmm_windowed_t(h, wdt, impl=impl))
        tol = 1e-4 if dt == jnp.float32 else 5e-2
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol)

    def test_windowed_t_odd_feature_dim(self):
        # F=5 pads the sublane axis to 8; output crops back
        g = geo_bfs_graph()
        wdt = graph_lib.window_dense_t(g, r_block=128, dtype=jnp.float32)
        h = jax.random.normal(jax.random.PRNGKey(6), (g.num_nodes, 5))
        want = np.asarray(spmm.spmm_coo(h, g))
        for impl in ("jnp", "pallas_interpret"):
            got = np.asarray(spmm.spmm_windowed_t(h, wdt, impl=impl))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("impl", ["jnp", "pallas_interpret"])
    @pytest.mark.parametrize("dt", [jnp.float32, jnp.int8])
    def test_bucketed_t_matches_oracle(self, impl, dt):
        # round-5 variable-width feature-major layout: bucketed width
        # classes + transposed tiles + 128-aligned starts
        g = geo_bfs_graph(weighted=(dt == jnp.float32))
        bwt = graph_lib.window_dense_bucketed_t(g, r_block=128, dtype=dt)
        assert len(bwt.widths) >= 1
        assert all(w % 128 == 0 for w in bwt.widths)
        assert int(bwt.w_start[0]) % 128 == 0
        h = jax.random.normal(jax.random.PRNGKey(2), (g.num_nodes, 16))
        h = h.astype(jnp.float32 if dt == jnp.float32 else jnp.bfloat16)
        want = np.asarray(spmm.spmm_coo(h.astype(jnp.float32), g))
        got = np.asarray(spmm.spmm_windowed_t(h, bwt, impl=impl))
        tol = 1e-4 if dt == jnp.float32 else 5e-2
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol)

    def test_windowed_t_grad_matches_segment_sum(self):
        g = geo_bfs_graph(weighted=True)
        fwd = graph_lib.window_dense_t(g, 128, dtype=jnp.float32)
        bwd = graph_lib.window_dense_t(g.transpose(), 128,
                                       dtype=jnp.float32)
        op = spmm.make_spmm_windowed_t_call(impl="jnp")
        h = jax.random.normal(jax.random.PRNGKey(3), (g.num_nodes, 16))
        gout = jax.random.normal(jax.random.PRNGKey(4), (g.num_nodes, 16))
        dh = jax.vjp(lambda x: op(x, fwd, bwd), h)[1](gout)[0]
        dh_ref = jax.vjp(lambda x: spmm.spmm_coo(x, g), h)[1](gout)[0]
        np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_ref),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("impl", ["jnp", "pallas_interpret"])
    @pytest.mark.parametrize("dt", [jnp.float32, jnp.int8])
    def test_bucketed_matches_oracle(self, impl, dt):
        # variable-width windowed layout (round 4): bucket-major grid,
        # per-bucket A widths, prefetched out-block indices
        g = geo_bfs_graph(weighted=(dt == jnp.float32))
        bwg = graph_lib.window_dense_bucketed(g, r_block=128,
                                              max_buckets=3, dtype=dt)
        assert len(bwg.widths) >= 2          # the DP actually bucketed
        h = jax.random.normal(jax.random.PRNGKey(2), (g.num_nodes, 32))
        hh = h if dt == jnp.float32 else h.astype(jnp.bfloat16)
        want = np.asarray(spmm.spmm_coo(h, g))
        got = np.asarray(spmm.spmm_windowed(hh, bwg, impl=impl))
        tol = 1e-4 if dt == jnp.float32 else 3e-2
        np.testing.assert_allclose(got, want, rtol=tol, atol=tol)

    def test_bucketed_grad_matches_segment_sum(self):
        g = geo_bfs_graph(weighted=True)
        fwd = graph_lib.window_dense_bucketed(g, 128, 3, jnp.float32)
        bwd = graph_lib.window_dense_bucketed(g.transpose(), 128, 3,
                                              jnp.float32)
        op = spmm.make_spmm_windowed_call(impl="jnp")
        h = jax.random.normal(jax.random.PRNGKey(3), (g.num_nodes, 16))
        loss = lambda x, f_, b_: jnp.sum(op(x, f_, b_) ** 2)
        dh = jax.grad(loss, argnums=0)(h, fwd, bwd)
        dh_ref = jax.grad(lambda x: jnp.sum(spmm.spmm_coo(x, g) ** 2))(h)
        np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_bucketed_total_width_not_worse_than_uniform(self):
        g = geo_bfs_graph()
        wd = graph_lib.window_dense(g, r_block=128, dtype=jnp.float32)
        bwg = graph_lib.window_dense_bucketed(g, r_block=128,
                                              max_buckets=3,
                                              dtype=jnp.float32)
        total_uniform = wd.a_dense.size
        total_bucketed = sum(a.size for a in bwg.a_parts)
        assert total_bucketed <= total_uniform

    @pytest.mark.parametrize("impl", ["jnp", "pallas_interpret"])
    def test_weighted_grads_match_coo_autodiff(self, impl):
        # learned-edge-weight path on the fast layout (round-3 missing
        # item 4): value, dh AND dw must equal autodiff through the COO
        # segment-sum oracle with the weights as a variable
        gb = geo_bfs_graph()
        fwd = graph_lib.window_dense(gb, 128, 512, dtype=jnp.float32)
        bwd = graph_lib.window_dense(gb.transpose(), 128, 512,
                                     dtype=jnp.float32)
        fs = graph_lib.window_edge_slots(gb, fwd)
        bs = graph_lib.window_edge_slots(gb.transpose(), bwd)
        op = spmm.make_weighted_spmm_windowed(fwd, fs, bwd, bs, impl=impl)

        n, e = gb.num_nodes, gb.num_edges
        h = jax.random.normal(jax.random.PRNGKey(3), (n, 32))
        w = jax.random.uniform(jax.random.PRNGKey(4), (e,)) + 0.5
        gout = jax.random.normal(jax.random.PRNGKey(5), (n, 32))

        def ref(h, w):
            gw = graph_lib.COOGraph(senders=gb.senders,
                                    receivers=gb.receivers,
                                    weights=w, num_nodes=n)
            return spmm.spmm_coo(h, gw)

        np.testing.assert_allclose(np.asarray(op(h, w)),
                                   np.asarray(ref(h, w)),
                                   rtol=1e-4, atol=1e-4)
        loss = lambda f: lambda *a: jnp.sum(f(*a) * gout)
        dh, dw = jax.grad(loss(op), argnums=(0, 1))(h, w)
        dh_r, dw_r = jax.grad(loss(ref), argnums=(0, 1))(h, w)
        np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_r),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_r),
                                   rtol=1e-4, atol=1e-4)

    def test_weighted_duplicate_edges_accumulate(self):
        # duplicates share a dense A slot; forward accumulates and each
        # copy's dw reads the shared slot's score — exact by linearity
        g = graph_lib.COOGraph(
            senders=jnp.asarray([3, 3, 5], jnp.int32),
            receivers=jnp.asarray([7, 7, 7], jnp.int32),
            weights=jnp.ones((3,)), num_nodes=16)
        fwd = graph_lib.window_dense(g, 8, 16, dtype=jnp.float32)
        bwd = graph_lib.window_dense(g.transpose(), 8, 16,
                                     dtype=jnp.float32)
        fs = graph_lib.window_edge_slots(g, fwd)
        bs = graph_lib.window_edge_slots(g.transpose(), bwd)
        op = spmm.make_weighted_spmm_windowed(fwd, fs, bwd, bs, impl="jnp")
        h = jnp.eye(16)
        w = jnp.asarray([2.0, 0.5, 1.0])
        out = np.asarray(op(h, w))
        assert out[7, 3] == pytest.approx(2.5)
        dw = jax.grad(lambda w: op(h, w)[7, 3])(w)
        np.testing.assert_allclose(np.asarray(dw), [1.0, 1.0, 0.0],
                                   atol=1e-6)

    def test_weighted_rejects_int8_layout(self):
        g = geo_bfs_graph()
        fwd = graph_lib.window_dense(g, 128, 512, dtype=jnp.int8)
        bwd = graph_lib.window_dense(g.transpose(), 128, 512,
                                     dtype=jnp.int8)
        fs = graph_lib.window_edge_slots(g, fwd)
        bs = graph_lib.window_edge_slots(g.transpose(), bwd)
        with pytest.raises(ValueError, match="int8|float"):
            spmm.make_weighted_spmm_windowed(fwd, fs, bwd, bs)

    def test_call_style_grad(self):
        g = geo_bfs_graph(weighted=True)
        fwd = graph_lib.window_dense(g, 128, 512, dtype=jnp.float32)
        bwd = graph_lib.window_dense(g.transpose(), 128, 512,
                                     dtype=jnp.float32)
        op = spmm.make_spmm_windowed_call(impl="jnp")
        h = jax.random.normal(jax.random.PRNGKey(3), (g.num_nodes, 16))
        loss = lambda x, f_, b_: jnp.sum(op(x, f_, b_) ** 2)
        dh = jax.grad(loss, argnums=0)(h, fwd, bwd)
        ref = lambda x: jnp.sum(spmm.spmm_coo(x, g) ** 2)
        dh_ref = jax.grad(ref)(h)
        np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_ref),
                                   rtol=1e-4, atol=1e-4)


class TestSampledBlockedBackward:
    def test_grad_matches_native_vjp(self):
        g = make_graph(n=300, e=3000, weighted=True)
        csr = graph_lib.to_csr(g)
        fd = graph_lib.sample_neighbors(jax.random.PRNGKey(7), csr, 8)
        bwd_blocked = graph_lib.block_by_receiver(g.transpose(), r_block=64)
        op = spmm.make_spmm_sampled(bwd_blocked, impl="jnp")
        h = jax.random.normal(jax.random.PRNGKey(8), (300, 32))
        gout = jax.random.normal(jax.random.PRNGKey(9), (300, 32))
        dh = jax.vjp(lambda x: op(x, fd), h)[1](gout)[0]
        # oracle: spmm_fixed_degree's native XLA scatter-add VJP
        dh_ref = jax.vjp(lambda x: spmm.spmm_fixed_degree(x, fd), h)[1](
            gout)[0]
        np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_grad_with_zero_degree_nodes(self):
        # node 5 has no in-edges: its sampled slots are self-pointing with
        # weight 0 and sentinel edge ids; grads must ignore them
        g = graph_lib.COOGraph(
            senders=jnp.asarray([0, 1, 2], jnp.int32),
            receivers=jnp.asarray([1, 2, 0], jnp.int32),
            weights=jnp.ones((3,)), num_nodes=6)
        csr = graph_lib.to_csr(g)
        fd = graph_lib.sample_neighbors(jax.random.PRNGKey(1), csr, 4)
        bwd_blocked = graph_lib.block_by_receiver(g.transpose(), r_block=8)
        op = spmm.make_spmm_sampled(bwd_blocked, impl="jnp")
        h = jax.random.normal(jax.random.PRNGKey(2), (6, 8))
        gout = jnp.ones((6, 8))
        dh = jax.vjp(lambda x: op(x, fd), h)[1](gout)[0]
        dh_ref = jax.vjp(lambda x: spmm.spmm_fixed_degree(x, fd), h)[1](
            gout)[0]
        np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_ref),
                                   rtol=1e-5, atol=1e-5)


class TestWindowedInt8:
    def test_int8_matches_oracle(self):
        g = geo_bfs_graph()                           # unweighted
        wd = graph_lib.window_dense(g, r_block=128, window=512,
                                    dtype=jnp.int8)
        assert wd.a_dense.dtype == jnp.int8
        h = jax.random.normal(jax.random.PRNGKey(2), (g.num_nodes, 64))
        want = np.asarray(spmm.spmm_coo(h, g)).astype(np.float32)
        got = np.asarray(spmm.spmm_windowed(h, wd, impl="jnp"))
        np.testing.assert_allclose(got, want, rtol=5e-2, atol=6e-2)
        got_k = np.asarray(spmm.spmm_windowed(h, wd,
                                              impl="pallas_interpret"))
        np.testing.assert_allclose(got_k, want, rtol=5e-2, atol=6e-2)

    def test_int8_rejects_fractional_weights(self):
        g = geo_bfs_graph(weighted=True)
        with pytest.raises(ValueError, match="int8"):
            graph_lib.window_dense(g, r_block=128, window=512,
                                   dtype=jnp.int8)
