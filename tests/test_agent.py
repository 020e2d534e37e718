"""Tests: replay ring, policies, Bellman targets, jitted train step."""

import jax
import jax.numpy as jnp
import numpy as np

from gnnra_tpu.agent import dqn, policy
from gnnra_tpu.agent import replay as replay_lib
from gnnra_tpu.config import EnvConfig, ModelConfig, TrainConfig
from gnnra_tpu.env import vehicular

ENV_CFG = EnvConfig()
MODEL_CFG = ModelConfig()
TRAIN_CFG = TrainConfig(memory_capacity=128, batch_size=16,
                        transitions_per_step=5)


def _fake_transition(i):
    n, dn, de = 4, 9, 4
    return (jnp.full((n, dn), float(i)), jnp.full((n, de), float(i)),
            jnp.ones((n, n)), jnp.full((n,), i % 4, jnp.int32),
            jnp.asarray(float(i)), jnp.full((n, dn), float(i + 1)),
            jnp.full((n, de), float(i + 1)))


class TestReplay:
    def test_add_and_wraparound(self):
        rep = replay_lib.init(MODEL_CFG, capacity=8)
        for i in range(10):
            rep = replay_lib.add(rep, *_fake_transition(i))
        assert int(rep.size) == 8
        assert int(rep.cursor) == 2
        # slots 0,1 overwritten by transitions 8,9 (FIFO)
        assert float(rep.reward[0]) == 8.0
        assert float(rep.reward[1]) == 9.0
        assert float(rep.reward[2]) == 2.0

    def test_add_batch_matches_sequential(self):
        rep_a = replay_lib.init(MODEL_CFG, capacity=16)
        rep_b = replay_lib.init(MODEL_CFG, capacity=16)
        ts = [_fake_transition(i) for i in range(5)]
        for t in ts:
            rep_a = replay_lib.add(rep_a, *t)
        stacked = [jnp.stack(x) for x in zip(*ts)]
        rep_b = replay_lib.add_batch(rep_b, *stacked)
        for la, lb in zip(jax.tree.leaves(rep_a), jax.tree.leaves(rep_b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def test_add_batch_wrapping_matches_sequential(self):
        # Non-divisible capacity (13 % 5 != 0) exercises the cond'd path's
        # `wrapped` branch: cursor at 10, a 5-burst wraps rows 10,11,12,0,1.
        rep_a = replay_lib.init(MODEL_CFG, capacity=13)
        rep_b = replay_lib.init(MODEL_CFG, capacity=13)
        warm = [_fake_transition(i) for i in range(10)]
        for t in warm:
            rep_a = replay_lib.add(rep_a, *t)
            rep_b = replay_lib.add(rep_b, *t)
        burst = [_fake_transition(i) for i in range(10, 15)]
        for t in burst:
            rep_a = replay_lib.add(rep_a, *t)
        stacked = [jnp.stack(x) for x in zip(*burst)]
        rep_b = replay_lib.add_batch(rep_b, *stacked)
        assert int(rep_b.cursor) == 2 and int(rep_b.size) == 13
        for la, lb in zip(jax.tree.leaves(rep_a), jax.tree.leaves(rep_b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def test_add_batch_cursor_desync_fails_loudly(self):
        # Divisible capacity (15 % 5 == 0) emits the cond-free DUS path,
        # which is only correct for burst-aligned cursors. An interleaved
        # single-row `add` desyncs the cursor; the guard must make that
        # loud (NaN-poisoned rows) rather than silently corrupt FIFO order.
        rep = replay_lib.init(MODEL_CFG, capacity=15)
        rep = replay_lib.add(rep, *_fake_transition(0))     # cursor -> 1
        burst = [_fake_transition(i) for i in range(1, 6)]
        stacked = [jnp.stack(x) for x in zip(*burst)]
        rep = replay_lib.add_batch(rep, *stacked)
        assert np.isnan(np.asarray(rep.data[1:6])).all()
        # aligned bursts stay NaN-free
        rep2 = replay_lib.init(MODEL_CFG, capacity=15)
        rep2 = replay_lib.add_batch(rep2, *stacked)
        assert not np.isnan(np.asarray(rep2.data)).any()

    def test_sample_fast_in_range(self):
        rep = replay_lib.init(MODEL_CFG, capacity=64)
        for i in range(10):
            rep = replay_lib.add(rep, *_fake_transition(i))
        idx = replay_lib.sample_indices(rep, jax.random.PRNGKey(0), 32,
                                        TRAIN_CFG)
        assert idx.shape == (32,)
        assert np.all((np.asarray(idx) >= 0) & (np.asarray(idx) < 10))

    def test_sample_faithful_without_replacement(self):
        cfg = TrainConfig(replay_sampling="faithful")
        rep = replay_lib.init(MODEL_CFG, capacity=64)
        for i in range(40):
            rep = replay_lib.add(rep, *_fake_transition(i))
        idx = np.asarray(replay_lib.sample_indices(
            rep, jax.random.PRNGKey(1), 32, cfg))
        assert len(np.unique(idx)) == 32          # distinct
        assert np.all(idx < 40)

    def test_gather_shapes(self):
        rep = replay_lib.init(MODEL_CFG, capacity=32)
        for i in range(6):
            rep = replay_lib.add(rep, *_fake_transition(i))
        batch = replay_lib.gather(rep, jnp.asarray([0, 3, 5]))
        node, edge, adj, action, reward, nnode, nedge = batch
        assert node.shape == (3, 4, 9) and adj.shape == (3, 4, 4)
        np.testing.assert_allclose(np.asarray(reward), [0.0, 3.0, 5.0])


class TestPolicy:
    def test_epsilon_anneal_schedule(self):
        cfg = TrainConfig()
        total = 1000
        eps0 = float(policy.epsilon_at(jnp.asarray(0), total, cfg))
        eps_mid = float(policy.epsilon_at(jnp.asarray(400), total, cfg))
        eps_end = float(policy.epsilon_at(jnp.asarray(900), total, cfg))
        assert abs(eps0 - 1.0) < 1e-6
        # linear: at 400/800 anneal steps -> halfway between 1 and 0.01
        assert abs(eps_mid - (1.0 - (1.0 - 0.01) * 400 / 800)) < 1e-5
        assert abs(eps_end - 0.01) < 1e-6

    def test_greedy_and_random(self):
        q = jnp.asarray([[0.0, 1.0, 0.5, 0.2], [3.0, 1.0, 0.5, 0.2]])
        np.testing.assert_array_equal(np.asarray(policy.greedy_actions(q)),
                                      [1, 0])
        acts = policy.random_actions(jax.random.PRNGKey(0), 1000, 4)
        counts = np.bincount(np.asarray(acts), minlength=4)
        assert counts.min() > 180                 # roughly uniform

    def test_epsilon_greedy_branches(self):
        q = jnp.asarray([[9.0, 0.0], [0.0, 9.0]])
        a_greedy, e1 = policy.epsilon_greedy(jax.random.PRNGKey(0), q,
                                             jnp.asarray(0.0))
        np.testing.assert_array_equal(np.asarray(a_greedy), [0, 1])
        assert not bool(e1)
        _, e2 = policy.epsilon_greedy(jax.random.PRNGKey(0), q,
                                      jnp.asarray(1.0))
        assert bool(e2)


class TestBellman:
    def test_targets(self):
        q_s = jnp.zeros((2, 3, 4))
        q_sp = jnp.asarray(np.arange(24).reshape(2, 3, 4), jnp.float32)
        actions = jnp.asarray([[0, 1, 2], [3, 0, 1]], jnp.int32)
        rewards = jnp.asarray([1.0, 2.0])
        y = np.asarray(dqn.bellman_targets(q_s, q_sp, actions, rewards, 0.5))
        # non-chosen entries keep q_s (=0)
        assert y[0, 0, 1] == 0.0
        # chosen entries: r + gamma*max(q_sp[head])
        assert y[0, 0, 0] == 1.0 + 0.5 * 3.0
        assert y[0, 1, 1] == 1.0 + 0.5 * 7.0
        assert y[1, 0, 3] == 2.0 + 0.5 * 15.0


class TestTrainStep:
    def test_rollout_fills_replay_and_advances_env(self):
        agent = dqn.init_agent(jax.random.PRNGKey(0), MODEL_CFG, TRAIN_CFG)
        env_state = vehicular.new_random_game(jax.random.PRNGKey(1), ENV_CFG)
        agent2, env2, rewards = dqn.rollout(
            agent, env_state, jax.random.PRNGKey(2), ENV_CFG, MODEL_CFG,
            TRAIN_CFG, total_env_steps=1000)
        assert int(agent2.replay.size) == TRAIN_CFG.transitions_per_step
        assert int(agent2.env_step) == TRAIN_CFG.transitions_per_step
        assert int(env2.step) == TRAIN_CFG.transitions_per_step
        assert rewards.shape == (TRAIN_CFG.transitions_per_step,)
        assert np.all(np.isfinite(np.asarray(rewards)))
        # stored next state of transition t == stored state of t+1
        np.testing.assert_allclose(np.asarray(agent2.replay.next_node[0]),
                                   np.asarray(agent2.replay.node[1]),
                                   rtol=1e-6)

    def test_replay_update_changes_params(self):
        agent = dqn.init_agent(jax.random.PRNGKey(0), MODEL_CFG, TRAIN_CFG)
        env_state = vehicular.new_random_game(jax.random.PRNGKey(1), ENV_CFG)
        agent, _, _ = dqn.rollout(agent, env_state, jax.random.PRNGKey(2),
                                  ENV_CFG, MODEL_CFG, TRAIN_CFG, 1000)
        before = jax.tree.leaves(agent.params)[0]
        agent2, metrics = dqn.replay_update(agent, jax.random.PRNGKey(3),
                                            MODEL_CFG, TRAIN_CFG)
        after = jax.tree.leaves(agent2.params)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))
        assert np.isfinite(float(metrics["loss"]))
        assert metrics["loss_per_head"].shape == (4,)
        assert metrics["q_mean"].shape == (4,)

    def test_target_sync_at_frequency(self):
        cfg = TrainConfig(memory_capacity=128, batch_size=8,
                          transitions_per_step=5,
                          target_update_every_env_steps=5)
        agent = dqn.init_agent(jax.random.PRNGKey(0), MODEL_CFG, cfg)
        # not synced at init (independent nets) — compare a weight leaf
        p0 = np.asarray(agent.params["gnn"][0]["w1"])
        t0 = np.asarray(agent.target_params["gnn"][0]["w1"])
        assert not np.allclose(p0, t0)
        env_state = vehicular.new_random_game(jax.random.PRNGKey(1), ENV_CFG)
        agent, env_state, _, _ = dqn.train_step(
            agent, env_state, jax.random.PRNGKey(2), ENV_CFG, MODEL_CFG, cfg,
            1000)
        # env_step = 5 -> 5 % 5 == 0 -> synced to (post-update) online params
        p1 = jax.tree.leaves(agent.params)
        t1 = jax.tree.leaves(agent.target_params)
        for a, b in zip(p1, t1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_step_jitted_and_loss_decreases(self):
        cfg = TrainConfig(memory_capacity=256, batch_size=32,
                          transitions_per_step=10,
                          target_update_every_env_steps=50)
        step = jax.jit(dqn.train_step, static_argnums=(3, 4, 5, 6))
        agent = dqn.init_agent(jax.random.PRNGKey(0), MODEL_CFG, cfg)
        env_state = vehicular.new_random_game(jax.random.PRNGKey(1), ENV_CFG)
        losses = []
        key = jax.random.PRNGKey(2)
        for i in range(8):
            key, k = jax.random.split(key)
            agent, env_state, _, metrics = step(
                agent, env_state, k, ENV_CFG, MODEL_CFG, cfg, 10000)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        # loss should broadly decrease as the Q function fits the targets
        assert np.mean(losses[-3:]) < np.mean(losses[:3])


class TestTrainEpisodes:
    def test_train_episode_shapes(self):
        cfg = TrainConfig(memory_capacity=256, batch_size=16,
                          transitions_per_step=5)
        agent = dqn.init_agent(jax.random.PRNGKey(0), MODEL_CFG, cfg)
        agent, rewards, metrics = dqn.train_episode(
            agent, jax.random.PRNGKey(1), ENV_CFG, MODEL_CFG, cfg,
            num_train_steps=3, total_env_steps=1000)
        assert rewards.shape == (3, 5)
        assert metrics["loss_per_head"].shape == (3, 4)
        assert int(agent.replay.size) == 15

    def test_pack_unpack_roundtrip(self):
        cfg = TrainConfig(memory_capacity=512, batch_size=16,
                          transitions_per_step=5)
        agent = dqn.init_agent(jax.random.PRNGKey(0), MODEL_CFG, cfg)
        agent, packed = dqn.train_episodes(
            agent, jax.random.PRNGKey(1), ENV_CFG, MODEL_CFG, cfg,
            num_episodes=2, num_train_steps=3, total_env_steps=1000)
        assert packed.shape == (2, 3, 5 * 4 + 1)
        metrics, rewards = dqn.unpack_episode_metrics(np.asarray(packed), 4)
        # rewards come back as per-train-step totals (reduced on device)
        assert rewards.shape == (2, 3, 1)
        assert metrics["q_mean"].shape == (2, 3, 4)
        # cross-check one episode against the unchunked API
        agent2 = dqn.init_agent(jax.random.PRNGKey(0), MODEL_CFG, cfg)
        keys = jax.random.split(jax.random.PRNGKey(1), 2)
        agent2, r0, m0 = dqn.train_episode(
            agent2, keys[0], ENV_CFG, MODEL_CFG, cfg, 3, 1000)
        np.testing.assert_allclose(np.asarray(r0).sum(axis=-1),
                                   rewards[0, :, 0], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(m0["loss_per_head"]),
                                   metrics["loss_per_head"][0], rtol=1e-4,
                                   atol=1e-6)

    def test_snapshot_chunks_match_sequential_groups(self):
        # train_episodes_snapshots(C, every) must equal running
        # train_episodes(every) per group with the same group keys, and
        # each snapshot must equal that group's end-of-group weights.
        cfg = TrainConfig(memory_capacity=256, batch_size=16,
                          transitions_per_step=5)
        agent = dqn.init_agent(jax.random.PRNGKey(0), MODEL_CFG, cfg)
        agent, packed, snaps = dqn.train_episodes_snapshots(
            agent, jax.random.PRNGKey(1), ENV_CFG, MODEL_CFG, cfg,
            num_episodes=4, num_train_steps=2, total_env_steps=1000,
            snapshot_every=2)
        assert packed.shape[0] == 4
        snap_p, snap_t, snap_opt, snap_step = snaps
        assert jax.tree.leaves(snap_p)[0].shape[0] == 2

        agent2 = dqn.init_agent(jax.random.PRNGKey(0), MODEL_CFG, cfg)
        group_keys = jax.random.split(jax.random.PRNGKey(1), 2)
        for g in range(2):
            agent2, packed_g = dqn.train_episodes(
                agent2, group_keys[g], ENV_CFG, MODEL_CFG, cfg,
                num_episodes=2, num_train_steps=2, total_env_steps=1000)
            np.testing.assert_allclose(
                np.asarray(packed_g), np.asarray(packed[2 * g:2 * g + 2]),
                rtol=1e-5, atol=1e-6)
            for a, b in zip(jax.tree.leaves(agent2.params),
                            jax.tree.leaves(jax.tree.map(
                                lambda x: x[g], snap_p))):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-6, atol=1e-7)
            # snapshots carry optimizer state for exact crash resume
            for a, b in zip(jax.tree.leaves(agent2.opt_state),
                            jax.tree.leaves(jax.tree.map(
                                lambda x: x[g], snap_opt))):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-6, atol=1e-7)
            assert int(snap_step[g]) == int(agent2.env_step)
        for a, b in zip(jax.tree.leaves(agent2.params),
                        jax.tree.leaves(agent.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_batched_episode(self):
        cfg = TrainConfig(memory_capacity=512, batch_size=16,
                          transitions_per_step=4)
        agent = dqn.init_agent(jax.random.PRNGKey(0), MODEL_CFG, cfg)
        agent, rewards, metrics = dqn.train_episode(
            agent, jax.random.PRNGKey(1), ENV_CFG, MODEL_CFG, cfg,
            num_train_steps=2, total_env_steps=1000, num_envs=3)
        assert rewards.shape == (2, 12)        # T * num_envs flattened
        assert int(agent.replay.size) == 2 * 4 * 3


class TestParallelRollout:
    """`rollout_parallel` must reproduce the sequential scan's trajectory
    EXACTLY (same keys -> same actions/rewards/replay/final state): in the
    reference's MDP actions never influence the next state (see
    TrainConfig.parallel_rollout)."""

    def test_matches_sequential_rollout(self):
        agent0 = dqn.init_agent(jax.random.PRNGKey(0), MODEL_CFG, TRAIN_CFG)
        env0 = vehicular.new_random_game(jax.random.PRNGKey(1), ENV_CFG)
        key = jax.random.PRNGKey(2)
        a_seq, env_seq, r_seq = dqn.rollout(
            agent0, env0, key, ENV_CFG, MODEL_CFG, TRAIN_CFG, 1000)
        a_par, env_par, r_par = dqn.rollout_parallel(
            agent0, env0, key, ENV_CFG, MODEL_CFG, TRAIN_CFG, 1000)
        np.testing.assert_allclose(np.asarray(r_par), np.asarray(r_seq),
                                   rtol=1e-5, atol=1e-6)
        for la, lb in zip(jax.tree.leaves(a_par.replay),
                          jax.tree.leaves(a_seq.replay)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-5, atol=1e-6)
        for la, lb in zip(jax.tree.leaves(env_par),
                          jax.tree.leaves(env_seq)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-5, atol=1e-5)
        assert int(a_par.env_step) == int(a_seq.env_step)

    def test_train_step_uses_parallel_by_default(self):
        assert TRAIN_CFG.parallel_rollout
        agent = dqn.init_agent(jax.random.PRNGKey(0), MODEL_CFG, TRAIN_CFG)
        env_state = vehicular.new_random_game(jax.random.PRNGKey(1), ENV_CFG)
        agent2, env2, rewards, metrics = dqn.train_step(
            agent, env_state, jax.random.PRNGKey(2), ENV_CFG, MODEL_CFG,
            TRAIN_CFG, 1000)
        assert np.isfinite(float(metrics["loss"]))
        assert int(agent2.replay.size) == TRAIN_CFG.transitions_per_step

    def test_batched_parallel_matches_batched_scan(self):
        agent0 = dqn.init_agent(jax.random.PRNGKey(0), MODEL_CFG, TRAIN_CFG)
        env_states = jax.vmap(
            lambda k: vehicular.new_random_game(k, ENV_CFG))(
            jax.random.split(jax.random.PRNGKey(1), 3))
        key = jax.random.PRNGKey(2)
        a_seq, env_seq, r_seq = dqn.rollout_batched(
            agent0, env_states, key, ENV_CFG, MODEL_CFG, TRAIN_CFG, 1000)
        a_par, env_par, r_par = dqn.rollout_batched_parallel(
            agent0, env_states, key, ENV_CFG, MODEL_CFG, TRAIN_CFG, 1000)
        np.testing.assert_allclose(np.asarray(r_par), np.asarray(r_seq),
                                   rtol=1e-5, atol=1e-6)
        for la, lb in zip(jax.tree.leaves(a_par.replay),
                          jax.tree.leaves(a_seq.replay)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-5, atol=1e-6)
        for la, lb in zip(jax.tree.leaves(env_par),
                          jax.tree.leaves(env_seq)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-5, atol=1e-5)
