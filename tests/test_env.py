"""Unit tests: vectorized JAX environment vs the scalar NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from gnnra_tpu.config import EnvConfig
from gnnra_tpu.env import channels, features, mobility, vehicular

CFG = EnvConfig()


def random_state(seed=0, n=4, cfg=CFG):
    """Build an EnvState with random but well-formed fields."""
    rng = np.random.RandomState(seed)
    positions = rng.uniform([0, 0], [cfg.width, cfg.height], size=(n, 2))
    state = vehicular.EnvState(
        positions=jnp.asarray(positions),
        directions=jnp.asarray(rng.randint(0, 4, n), jnp.int32),
        velocities=jnp.asarray(rng.randint(10, 16, n), jnp.float32),
        shadow_v2v=jnp.asarray(rng.normal(0, 3, (n, n))),
        shadow_v2i=jnp.asarray(rng.normal(0, 8, n)),
        v2v_abs=jnp.asarray(rng.uniform(60, 120, (n, n))),
        v2i_abs=jnp.asarray(rng.uniform(60, 120, n)),
        v2v_fast=jnp.asarray(rng.normal(0, 3, (n, n, cfg.n_rb))),
        v2i_fast=jnp.asarray(rng.normal(0, 3, (n, cfg.n_rb))),
        destinations=jnp.asarray([[1], [0], [3], [2]], jnp.int32),
        activate_links=jnp.ones((n, cfg.n_neighbor), bool),
        v2v_interference_db=jnp.zeros((n, cfg.n_neighbor, cfg.n_rb)),
        step=jnp.zeros((), jnp.int32))
    return state


class TestPathloss:
    def test_v2v_matches_oracle(self):
        rng = np.random.RandomState(1)
        positions = rng.uniform([0, 0], [750, 1299], size=(6, 2))
        got = np.asarray(channels.v2v_pathloss(jnp.asarray(positions), CFG))
        want = oracle.v2v_pathloss_matrix(positions)
        np.testing.assert_allclose(got, want, rtol=2e-4)

    def test_v2v_los_nlos_branches(self):
        # LOS short distance, LOS beyond breakpoint, NLOS corner.
        pts = np.array([[0.0, 0.0], [1.0, 2.0], [0.0, 500.0], [100.0, 200.0]])
        got = np.asarray(channels.v2v_pathloss(jnp.asarray(pts), CFG))
        want = oracle.v2v_pathloss_matrix(pts)
        np.testing.assert_allclose(got, want, rtol=2e-4)

    def test_v2i_matches_oracle(self):
        rng = np.random.RandomState(2)
        positions = rng.uniform([0, 0], [750, 1299], size=(5, 2))
        got = np.asarray(channels.v2i_pathloss(jnp.asarray(positions), CFG))
        want = oracle.v2i_pathloss_vector(positions)
        np.testing.assert_allclose(got, want, rtol=2e-4)


class TestShadowing:
    def test_ar1_statistics(self):
        # With constant delta, stationary distribution is N(0, std^2).
        key = jax.random.PRNGKey(0)
        shadow = jnp.zeros((2000,))
        for i in range(50):
            key, k = jax.random.split(key)
            shadow = channels.ar1_shadow_update(shadow, jnp.full((2000,), 5.0),
                                                10.0, 3.0, k)
        assert abs(float(shadow.std()) - 3.0) < 0.3
        assert abs(float(shadow.mean())) < 0.3

    def test_ar1_correlation(self):
        # rho = exp(-delta/decorr): one update from a known value.
        key = jax.random.PRNGKey(3)
        prev = jnp.full((100000,), 2.0)
        new = channels.ar1_shadow_update(prev, jnp.full((100000,), 10.0),
                                         10.0, 3.0, key)
        rho = np.exp(-1.0)
        assert abs(float(new.mean()) - rho * 2.0) < 0.05


class TestFastFading:
    def test_rayleigh_mean_power(self):
        # E[|h|^2] = 1 -> mean of 10^(ff/10) == 1.
        ff = channels.rayleigh_fading_db(jax.random.PRNGKey(0), (200, 200))
        lin = 10 ** (np.asarray(ff) / 10)
        assert abs(lin.mean() - 1.0) < 0.02


class TestReward:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_oracle(self, seed):
        state = random_state(seed)
        rng = np.random.RandomState(seed + 100)
        actions = rng.randint(0, CFG.n_rb, size=(4, 1))
        got = vehicular.compute_reward_with_channel_selection(
            state, jnp.asarray(actions, jnp.int32), CFG)
        want = oracle.compute_reward(
            actions, np.asarray(state.destinations),
            np.asarray(state.activate_links),
            np.asarray(vehicular.v2v_channels_with_fastfading(state)),
            np.asarray(vehicular.v2i_channels_with_fastfading(state)),
            np.asarray(state.v2i_abs), n_rb=CFG.n_rb)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w, rtol=1e-3)

    def test_inactive_links_masked(self):
        state = random_state(7)
        state = state.replace(
            activate_links=jnp.asarray([[True], [False], [True], [False]]))
        actions = np.array([[0], [0], [0], [1]])
        got = vehicular.compute_reward_with_channel_selection(
            state, jnp.asarray(actions, jnp.int32), CFG)
        want = oracle.compute_reward(
            actions, np.asarray(state.destinations),
            np.asarray(state.activate_links),
            np.asarray(vehicular.v2v_channels_with_fastfading(state)),
            np.asarray(vehicular.v2i_channels_with_fastfading(state)),
            np.asarray(state.v2i_abs), n_rb=CFG.n_rb)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w, rtol=1e-3)

    def test_shared_rb_interference(self):
        # All links on the same RB must interfere with each other.
        state = random_state(11)
        all_same = jnp.zeros((4, 1), jnp.int32)
        spread = jnp.asarray([[0], [1], [2], [3]], jnp.int32)
        r_same, _, _ = vehicular.compute_reward_with_channel_selection(
            state, all_same, CFG)
        r_spread, _, _ = vehicular.compute_reward_with_channel_selection(
            state, spread, CFG)
        assert float(r_same.sum()) < float(r_spread.sum())


class TestInterferenceObs:
    @pytest.mark.parametrize("seed", [0, 5])
    def test_matches_oracle_all_active(self, seed):
        state = random_state(seed)
        actions = np.random.RandomState(seed).randint(0, 4, size=(4, 1))
        got = vehicular.compute_interference_obs(
            state, jnp.asarray(actions, jnp.int32), CFG)
        want = oracle.compute_interference_obs(
            actions, np.asarray(state.destinations),
            np.asarray(state.activate_links),
            np.asarray(vehicular.v2v_channels_with_fastfading(state)),
            n_rb=CFG.n_rb)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)

    def test_matches_oracle_with_inactive_quirk(self):
        state = random_state(9)
        state = state.replace(
            activate_links=jnp.asarray([[True], [False], [True], [True]]))
        actions = np.array([[2], [1], [0], [3]])
        got = vehicular.compute_interference_obs(
            state, jnp.asarray(actions, jnp.int32), CFG)
        want = oracle.compute_interference_obs(
            actions, np.asarray(state.destinations),
            np.asarray(state.activate_links),
            np.asarray(vehicular.v2v_channels_with_fastfading(state)),
            n_rb=CFG.n_rb)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


class TestFeatures:
    def test_get_state_matches_oracle(self):
        state = random_state(4)
        v2v_c, v2i_c, v2v_e = features.get_state(state, CFG)
        v2v_ff = np.asarray(vehicular.v2v_channels_with_fastfading(state))
        v2i_ff = np.asarray(vehicular.v2i_channels_with_fastfading(state))
        for i in range(4):
            for j in range(1):
                wc, wi, we = oracle.get_state(
                    i, j, np.asarray(state.destinations), v2v_ff, v2i_ff, 4)
                np.testing.assert_allclose(np.asarray(v2v_c[i, j]), wc, rtol=1e-5)
                np.testing.assert_allclose(np.asarray(v2i_c[i]), wi, rtol=1e-5)
                np.testing.assert_allclose(np.asarray(v2v_e[i, j]), we, rtol=1e-4)

    def test_node_edge_shapes_and_packing(self):
        state = random_state(5)
        node, edge = features.node_edge_features(state, CFG)
        assert node.shape == (4, 9)
        assert edge.shape == (4, 4)
        # power feature is the raw fixed power level (10 dBm).
        np.testing.assert_allclose(np.asarray(node[:, 8]), 10.0)

    def test_adjacency(self):
        state = random_state(6)
        a = np.asarray(features.adjacency(state, CFG))
        dest0 = np.asarray(state.destinations[:, 0])
        want = np.ones((4, 4)) - np.eye(4)
        for v in range(4):
            want[dest0[v], v] = 0
        np.testing.assert_allclose(a, want)


class TestMobility:
    def test_straight_movement_no_turn(self):
        cfg = EnvConfig(turn_probability=0.0)
        # place vehicles away from lanes so no crossing happens
        positions = jnp.asarray([[300.0, 300.0], [300.0, 400.0],
                                 [300.0, 500.0], [300.0, 600.0]])
        dirs = jnp.asarray([0, 1, 2, 3], jnp.int32)  # u d l r
        vel = jnp.full((4,), 10.0)
        new_pos, new_dir = mobility.renew_positions(
            positions, dirs, vel, jax.random.PRNGKey(0), cfg)
        d = 10.0 * cfg.timestep
        np.testing.assert_allclose(np.asarray(new_dir), np.asarray(dirs))
        np.testing.assert_allclose(float(new_pos[0, 1]), 300.0 + d, rtol=1e-6)
        np.testing.assert_allclose(float(new_pos[1, 1]), 400.0 - d, rtol=1e-6)
        # faithful quirk: left-mover advances 6x (len(down_lanes) iterations)
        np.testing.assert_allclose(float(new_pos[2, 0]), 300.0 - 6 * d, rtol=1e-6)
        np.testing.assert_allclose(float(new_pos[3, 0]), 300.0 + d, rtol=1e-6)

    def test_left_quirk_disabled(self):
        cfg = EnvConfig(turn_probability=0.0, faithful_quirks=False)
        positions = jnp.asarray([[300.0, 300.0]])
        new_pos, _ = mobility.renew_positions(
            positions, jnp.asarray([2], jnp.int32), jnp.full((1,), 10.0),
            jax.random.PRNGKey(0), cfg)
        np.testing.assert_allclose(float(new_pos[0, 0]),
                                   300.0 - 10.0 * cfg.timestep, rtol=1e-6)

    def test_forced_turn_at_crossing(self):
        cfg = EnvConfig(turn_probability=1.0)
        # 'u' vehicle just below a left lane: must turn left onto it.
        lane = cfg.left_lanes[2]
        positions = jnp.asarray([[300.0, lane - 0.05]])
        vel = jnp.full((1,), 10.0)  # delta = 0.1 covers the lane
        new_pos, new_dir = mobility.renew_positions(
            positions, jnp.asarray([0], jnp.int32), vel,
            jax.random.PRNGKey(1), cfg)
        assert int(new_dir[0]) == mobility.DIR_L
        np.testing.assert_allclose(float(new_pos[0, 1]), lane, rtol=1e-6)
        # x decreases by the residual distance after reaching the lane
        np.testing.assert_allclose(
            float(new_pos[0, 0]), 300.0 - (0.1 - 0.05), atol=1e-4)

    def test_boundary_wrap(self):
        cfg = EnvConfig(turn_probability=0.0)
        # 'd' vehicle at the bottom edge exits and wraps to first left lane.
        positions = jnp.asarray([[300.0, 0.05]])
        vel = jnp.full((1,), 15.0)  # delta = 0.15 > 0.05
        new_pos, new_dir = mobility.renew_positions(
            positions, jnp.asarray([1], jnp.int32), vel,
            jax.random.PRNGKey(2), cfg)
        assert int(new_dir[0]) == mobility.DIR_L
        np.testing.assert_allclose(float(new_pos[0, 1]), cfg.left_lanes[0],
                                   rtol=1e-6)

    def test_spawn_layout(self):
        cfg = EnvConfig(n_veh=8)
        pos, dirs, vel = mobility.spawn_vehicles(jax.random.PRNGKey(0), cfg)
        assert pos.shape == (8, 2) and dirs.shape == (8,)
        # order per unit: d, u, l, r
        np.testing.assert_array_equal(np.asarray(dirs[:4]), [1, 0, 2, 3])
        assert np.all((np.asarray(vel) >= 10) & (np.asarray(vel) <= 15))
        # lane-bound coordinates
        assert float(pos[0, 0]) in [float(l) for l in cfg.down_lanes]
        assert float(pos[1, 0]) in [float(l) for l in cfg.up_lanes]


class TestEpisode:
    def test_new_random_game_and_act(self):
        key = jax.random.PRNGKey(0)
        state = vehicular.new_random_game(key, CFG)
        assert state.positions.shape == (4, 2)
        assert bool(state.activate_links.all())
        # destinations are valid vehicle ids, not self
        dest = np.asarray(state.destinations[:, 0])
        assert np.all(dest != np.arange(4))
        actions = jnp.asarray([[0], [1], [2], [3]], jnp.int32)
        state2, v2v_rate, v2i_rate, interf = vehicular.act(
            state, actions, jax.random.PRNGKey(1), CFG)
        assert v2v_rate.shape == (4, 1)
        assert v2i_rate.shape == (4,)
        assert interf.shape == (4,)
        assert int(state2.step) == 1
        assert np.all(np.asarray(v2v_rate) >= 0)
        # world advanced: channels changed
        assert not np.allclose(np.asarray(state.v2v_fast),
                               np.asarray(state2.v2v_fast))

    def test_act_is_jittable(self):
        cfg = CFG
        step = jax.jit(vehicular.act, static_argnums=3)
        state = vehicular.new_random_game(jax.random.PRNGKey(0), cfg)
        actions = jnp.zeros((4, 1), jnp.int32)
        state2, *_ = step(state, actions, jax.random.PRNGKey(1), cfg)
        assert int(state2.step) == 1

    def test_vmapped_envs(self):
        cfg = CFG
        keys = jax.random.split(jax.random.PRNGKey(0), 8)
        states = jax.vmap(lambda k: vehicular.new_random_game(k, cfg))(keys)
        assert states.positions.shape == (8, 4, 2)
        actions = jnp.zeros((8, 4, 1), jnp.int32)
        step_keys = jax.random.split(jax.random.PRNGKey(1), 8)
        states2, v2v, v2i, _ = jax.vmap(
            lambda s, a, k: vehicular.act(s, a, k, cfg))(states, actions,
                                                         step_keys)
        assert v2v.shape == (8, 4, 1)
        assert np.all(np.asarray(states2.step) == 1)


class TestQuirksOff:
    """The fixed-behavior path (faithful_quirks=False) for scaled configs."""

    def test_interference_obs_no_dead_branch(self):
        cfg = EnvConfig(faithful_quirks=False)
        state = random_state(9)
        state = state.replace(
            activate_links=jnp.asarray([[True], [False], [True], [True]]))
        actions = jnp.asarray([[2], [1], [0], [3]], jnp.int32)
        got = np.asarray(vehicular.compute_interference_obs(state, actions,
                                                            cfg))
        # without the quirk only the V2I term + noise contribute, so the
        # result must be independent of activate_links
        state_all = state.replace(
            activate_links=jnp.ones((4, 1), bool))
        got_all = np.asarray(vehicular.compute_interference_obs(
            state_all, actions, cfg))
        np.testing.assert_allclose(got, got_all, rtol=1e-6)

    def test_left_mover_single_step(self):
        cfg = EnvConfig(turn_probability=0.0, faithful_quirks=False)
        positions = jnp.asarray([[300.0, 300.0]])
        new_pos, _ = mobility.renew_positions(
            positions, jnp.asarray([2], jnp.int32), jnp.full((1,), 12.0),
            jax.random.PRNGKey(0), cfg)
        np.testing.assert_allclose(float(new_pos[0, 0]),
                                   300.0 - 12.0 * cfg.timestep, rtol=1e-6)


class TestRewardWeights:
    def test_v2i_weight_changes_reward_not_rates(self):
        state = random_state(3)
        actions = jnp.asarray([[0], [1], [2], [3]], jnp.int32)
        v2v, v2i, intf = vehicular.compute_reward_with_channel_selection(
            state, actions, CFG)
        # rates are weight-independent; the weighted sum is harness-side
        from gnnra_tpu.agent.dqn import _weighted_reward
        from gnnra_tpu.config import TrainConfig
        r1 = float(_weighted_reward(v2v, v2i, TrainConfig(v2i_weight=0.0)))
        r2 = float(_weighted_reward(v2v, v2i, TrainConfig(v2i_weight=1.0)))
        np.testing.assert_allclose(r2 - r1, float(v2i.sum()), rtol=1e-5)


class TestMobilityInvariants:
    def test_positions_stay_in_bounds_over_many_steps(self):
        cfg = CFG
        key = jax.random.PRNGKey(0)
        state = vehicular.new_random_game(key, cfg)
        pos, dirs = state.positions, state.directions
        vel = state.velocities
        step = jax.jit(mobility.renew_positions, static_argnums=4)
        for i in range(200):
            key, k = jax.random.split(key)
            pos, dirs = step(pos, dirs, vel, k, cfg)
        p = np.asarray(pos)
        assert np.all(p[:, 0] >= -1.0) and np.all(p[:, 0] <= cfg.width + 1.0)
        assert np.all(p[:, 1] >= -1.0) and np.all(p[:, 1] <= cfg.height + 1.0)
        d = np.asarray(dirs)
        assert np.all((d >= 0) & (d <= 3))

    def test_turn_probability_statistics(self):
        # at a guaranteed crossing, turns happen ~40% of the time
        cfg = CFG
        lane = cfg.left_lanes[2]
        n = 2000
        positions = jnp.tile(jnp.asarray([[300.0, lane - 0.05]]), (n, 1))
        dirs = jnp.zeros((n,), jnp.int32)            # all 'u'
        vel = jnp.full((n,), 10.0)                   # delta 0.1 crosses lane
        _, new_dirs = mobility.renew_positions(positions, dirs, vel,
                                               jax.random.PRNGKey(1), cfg)
        turned_left = float((np.asarray(new_dirs) == mobility.DIR_L).mean())
        # P(left turn) = 0.4; remaining 60% check right lanes (no crossing
        # here) and continue straight
        assert 0.35 < turned_left < 0.45


class TestChannelTrajectory:
    """The hoisted rollout path: precomputed action-independent channel
    evolution must match the sequential `act` semantics exactly."""

    def test_ar1_chain_matches_sequential_recurrence(self):
        key = jax.random.PRNGKey(5)
        s0 = jax.random.normal(key, (4, 4))
        rho = jnp.exp(-jnp.abs(jax.random.normal(
            jax.random.fold_in(key, 1), (4, 4))) / 10.0)
        noise = jax.random.normal(jax.random.fold_in(key, 2), (50, 4, 4))
        got = np.asarray(vehicular.ar1_chain(s0, rho, noise))
        c = np.sqrt(1.0 - np.asarray(rho) ** 2)
        s = np.asarray(s0)
        for t in range(50):
            s = np.asarray(rho) * s + c * np.asarray(noise[t])
            np.testing.assert_allclose(got[t], s, rtol=1e-5, atol=1e-6)

    def test_trajectory_internally_consistent(self):
        """positions follow the sequential mobility chain; abs losses are
        pathloss(positions) + shadow (+50 dB diag)."""
        cfg = CFG
        t_steps = 7
        state = vehicular.new_random_game(jax.random.PRNGKey(3), cfg)
        key = jax.random.PRNGKey(9)
        traj = vehicular.precompute_channel_trajectory(state, key, cfg,
                                                       t_steps)
        # mobility oracle: same one-batched-draw structure as the
        # implementation (uniforms for all T steps from a single call)
        k_mob = jax.random.split(key, 5)[0]
        u_mob = jax.random.uniform(
            k_mob, (t_steps, cfg.n_veh, 2, len(cfg.up_lanes)))
        pos, dirs = state.positions, state.directions
        for t in range(t_steps):
            pos, dirs = mobility.renew_positions_from_draws(
                pos, dirs, state.velocities, u_mob[t], cfg)
            np.testing.assert_allclose(np.asarray(traj.positions[t]),
                                       np.asarray(pos), rtol=1e-6)
            np.testing.assert_array_equal(np.asarray(traj.directions[t]),
                                          np.asarray(dirs))
            want_abs = (np.asarray(channels.v2v_pathloss(pos, cfg))
                        + np.asarray(traj.shadow_v2v[t])
                        + 50.0 * np.eye(cfg.n_veh))
            np.testing.assert_allclose(np.asarray(traj.v2v_abs[t]), want_abs,
                                       rtol=1e-5, atol=1e-5)
            want_v2i = (np.asarray(channels.v2i_pathloss(pos, cfg))
                        + np.asarray(traj.shadow_v2i[t]))
            np.testing.assert_allclose(np.asarray(traj.v2i_abs[t]), want_v2i,
                                       rtol=1e-5, atol=1e-5)

    def test_apply_precomputed_matches_act(self):
        """Feeding `apply_precomputed_transition` a trajectory RECORDED from
        sequential `act` calls reproduces act's states and rewards exactly —
        the transition plumbing is identical; only the noise source moved."""
        cfg = CFG
        t_steps = 5
        key = jax.random.PRNGKey(11)
        state_seq = vehicular.new_random_game(jax.random.PRNGKey(4), cfg)
        state_pre = state_seq
        actions = jax.random.randint(
            jax.random.fold_in(key, 99),
            (t_steps, cfg.n_veh, cfg.n_neighbor), 0, cfg.n_rb)
        for t in range(t_steps):
            k = jax.random.fold_in(key, t)
            state_seq, v2v_a, v2i_a, int_a = vehicular.act(
                state_seq, actions[t], k, cfg)
            rec = vehicular.ChannelTrajectory(
                positions=state_seq.positions, directions=state_seq.directions,
                shadow_v2v=state_seq.shadow_v2v, shadow_v2i=state_seq.shadow_v2i,
                v2v_abs=state_seq.v2v_abs, v2i_abs=state_seq.v2i_abs,
                v2v_fast=state_seq.v2v_fast, v2i_fast=state_seq.v2i_fast)
            state_pre, v2v_b, v2i_b, int_b = \
                vehicular.apply_precomputed_transition(state_pre, rec,
                                                       actions[t], cfg)
            np.testing.assert_allclose(np.asarray(v2v_a), np.asarray(v2v_b),
                                       rtol=1e-6)
            np.testing.assert_allclose(np.asarray(v2i_a), np.asarray(v2i_b),
                                       rtol=1e-6)
            np.testing.assert_allclose(np.asarray(int_a), np.asarray(int_b),
                                       rtol=1e-6)
            for leaf_a, leaf_b in zip(jax.tree.leaves(state_seq),
                                      jax.tree.leaves(state_pre)):
                np.testing.assert_allclose(np.asarray(leaf_a),
                                           np.asarray(leaf_b), rtol=1e-6)
