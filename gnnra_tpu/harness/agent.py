"""User-facing Agent runtime: train / test / evaluate harness.

Mirrors the public surface of the reference `class Agent`
(BS_brain.py:280-1451) — `train`, `test_run`,
`evaluate_training_diff_trials` — on top of the jitted core in
gnnra_tpu.agent.dqn. Host code only orchestrates episodes and checkpoints;
every inner loop (50-transition rollout bursts, replay updates, whole test
episodes including the 256-action brute-force optimal baseline) is a single
compiled XLA program.
"""

from __future__ import annotations

import datetime
import itertools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gnnra_tpu.agent import dqn, policy
from gnnra_tpu.config import RunConfig
from gnnra_tpu.env import features, vehicular
from gnnra_tpu.models import gnn_dqn
from gnnra_tpu.utils import checkpoint as ckpt


def enumerate_joint_actions(n_nodes: int, n_actions: int) -> jnp.ndarray:
    """All joint channel assignments [A^N, N] (reference base-4 decode,
    BS_brain.py:1067-1078, generalized to any N/A)."""
    total = n_actions ** n_nodes
    if total > 1_000_000:
        raise ValueError(
            f"brute-force optimal baseline needs {n_actions}^{n_nodes} = "
            f"{total} joint actions; disable opt_flag for scaled configs")
    combos = list(itertools.product(range(n_actions), repeat=n_nodes))
    return jnp.asarray(combos, jnp.int32)


class Agent:
    """Training/evaluation runtime for one RunConfig."""

    def __init__(self, run_cfg: RunConfig, results_base: str = "results",
                 seed: Optional[int] = None):
        self.cfg = run_cfg
        self.env_cfg = run_cfg.env
        self.model_cfg = run_cfg.model
        self.train_cfg = run_cfg.train
        self.eval_cfg = run_cfg.eval
        self.results_dir = ckpt.result_dir(results_base, run_cfg.train)
        seed = run_cfg.train.seed if seed is None else seed
        self.key = jax.random.PRNGKey(seed)
        self.state = dqn.init_agent(self._next_key(), self.model_cfg,
                                    self.train_cfg)
        # jitted cores (configs are static); agent/env state buffers are
        # donated — without donation every step copies the whole replay ring
        # (measured ~28x slower on TPU)
        self._train_step = jax.jit(dqn.train_step, static_argnums=(3, 4, 5, 6),
                                   donate_argnums=(0, 1))
        self._train_episode = jax.jit(dqn.train_episode,
                                      static_argnums=(2, 3, 4, 5, 6),
                                      donate_argnums=(0,))
        self._train_episodes = jax.jit(dqn.train_episodes,
                                       static_argnums=(2, 3, 4, 5, 6, 7, 8),
                                       donate_argnums=(0,))
        self._train_episodes_snap = jax.jit(
            dqn.train_episodes_snapshots,
            static_argnums=(2, 3, 4, 5, 6, 7, 8, 9), donate_argnums=(0,))
        self._new_game = jax.jit(vehicular.new_random_game, static_argnums=1)
        self._test_episode = jax.jit(self._test_episode_impl,
                                     static_argnums=(3, 4, 5))
        # whole CHUNK of test episodes (fresh games + episode scans) as one
        # program: the per-episode host loop costs one dispatch + a full
        # device->host metrics pull per episode (~330 ms/episode measured
        # with the 256-action Opt baseline); vmapping E episodes amortizes
        # both
        self._test_episode_chunk = jax.jit(
            lambda params, keys_game, keys_ep, opt, eps, steps: jax.vmap(
                lambda kg, ke: self._test_episode_impl(
                    params,
                    vehicular.new_random_game(kg, self.env_cfg),
                    ke, opt, eps, steps))(keys_game, keys_ep),
            static_argnums=(3, 4, 5))
        self._eval_ckpts = jax.jit(self._eval_ckpts_impl,
                                   static_argnums=(4,))

    # ------------------------------------------------------------------
    def _next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def _log(self, msg: str):
        now = datetime.datetime.now().strftime("%Y/%m/%d %H:%M:%S")
        print(f"[{now}] {msg}", flush=True)

    # ------------------------------------------------------------------
    # Training (reference Agent.train, BS_brain.py:750-910)
    # ------------------------------------------------------------------
    def train(self, num_episodes: Optional[int] = None,
              num_train_steps: Optional[int] = None,
              log_interval: int = 200,
              schedule_episodes: Optional[int] = None,
              start_episode: int = 0,
              save_resume_state: bool = False,
              resume_interval: Optional[int] = None
              ) -> Dict[str, np.ndarray]:
        """Train for num_episodes. `schedule_episodes` pins the epsilon
        anneal horizon to a larger run when training in resumable segments
        (the agent's env_step counter carries across segments);
        `start_episode` offsets checkpoint numbering for such segments.

        `save_resume_state=True` additionally writes a rolling
        resume-latest.npz at every chunk boundary containing the FULL agent
        state including the replay ring, so `resume_latest` continues
        bit-exactly (otherwise resume restores params/target/opt/env-step/
        RNG but the replay ring restarts empty). The pull is expensive on a
        tunnel-attached runtime (~9 s for the 100 MB ring at 1M capacity,
        measured), so `resume_interval` sets its cadence in episodes
        (default: every chunk — crash-rewind cost vs wall-clock tradeoff;
        production runs with cheap restarts should raise it)."""
        tc = self.train_cfg
        num_episodes = num_episodes or tc.num_episodes
        num_train_steps = num_train_steps or tc.num_train_steps
        n = self.model_cfg.n_nodes
        num_envs = tc.num_envs
        total_env_steps = ((schedule_episodes or num_episodes)
                           * num_train_steps * tc.transitions_per_step)
        t_cols = 1    # per-train-step reward totals (reduced on device)

        train_loss = np.ones((n, num_episodes, num_train_steps))
        q_mean = np.zeros((n, num_episodes, num_train_steps))
        q_max_mean = np.zeros((n, num_episodes, num_train_steps))
        orig_q_mean = np.zeros((n, num_episodes, num_train_steps))
        orig_q_max_mean = np.zeros((n, num_episodes, num_train_steps))
        reward_per_step = np.zeros((num_episodes, num_train_steps, t_cols))
        reward_per_episode = np.zeros(num_episodes)

        self._log(f"training: episodes={num_episodes} "
                  f"steps={num_train_steps} batch={tc.batch_size} "
                  f"gamma={tc.gamma} v2i_weight={tc.v2i_weight}")

        # Chunk episodes per device dispatch: each host round trip costs
        # ~1.5-3.5 ms regardless of payload, so C episodes run as one
        # program and come back as ONE packed metrics array. The chunk is
        # NOT bounded by the checkpoint cadence: when it spans several
        # save_model_interval periods, dqn.train_episodes_snapshots emits
        # in-chunk (params, target, env_step) snapshots and the host writes
        # the intermediate checkpoints from those (async), keeping the
        # reference's every-5-episode cadence (BS_brain.py:791).
        si = max(1, tc.save_model_interval)
        chunk = max(si, (min(tc.episode_chunk, num_episodes) // si) * si)
        ckpt_threads = []
        ep = 0
        try:
            while ep < num_episodes:
                c = min(chunk, num_episodes - ep)
                if c >= 2 * si and c % si == 0:
                    self.state, packed, snaps = self._train_episodes_snap(
                        self.state, self._next_key(), self.env_cfg,
                        self.model_cfg, tc, c, num_train_steps,
                        total_env_steps, si, num_envs)
                else:
                    c = min(si, num_episodes - ep)
                    self.state, packed = self._train_episodes(
                        self.state, self._next_key(), self.env_cfg,
                        self.model_cfg, tc, c, num_train_steps,
                        total_env_steps, num_envs)
                    snaps = None
                metrics, rewards = dqn.unpack_episode_metrics(
                    np.asarray(jax.device_get(packed)), n)
                sl = slice(ep, ep + c)
                reward_per_step[sl] = rewards                    # [C, S, T]
                train_loss[:, sl, :] = \
                    metrics["loss_per_head"].transpose(2, 0, 1)
                q_mean[:, sl, :] = metrics["q_mean"].transpose(2, 0, 1)
                q_max_mean[:, sl, :] = metrics["q_max_mean"].transpose(2, 0, 1)
                orig_q_mean[:, sl, :] = \
                    metrics["orig_q_mean"].transpose(2, 0, 1)
                orig_q_max_mean[:, sl, :] = \
                    metrics["orig_q_max_mean"].transpose(2, 0, 1)
                reward_per_episode[sl] = rewards.sum(axis=(1, 2))
                ep += c
                if snaps is not None:
                    # Intermediate checkpoints from the in-chunk snapshots.
                    # They carry the optimizer state too, so resume_latest
                    # restores Adam moments exactly no matter which save the
                    # process died after; the chunk-final checkpoint
                    # reflects self.state.
                    snap_p, snap_t, snap_opt, snap_step = snaps
                    groups = c // si
                    for g in range(groups - 1):
                        episode_no = start_episode + ep - c + (g + 1) * si
                        ckpt_threads.append(ckpt.save_async(
                            ckpt.checkpoint_path(self.results_dir,
                                                 episode_no),
                            jax.tree.map(lambda x: x[g], snap_p),
                            jax.tree.map(lambda x: x[g], snap_t),
                            jax.tree.map(lambda x: x[g], snap_opt),
                            episode=episode_no,
                            env_step=np.asarray(snap_step[g])))
                    self.save_checkpoint(start_episode + ep)
                    if save_resume_state and (
                            ep % (resume_interval or chunk) < chunk
                            or ep == num_episodes):
                        self.save_resume_state(start_episode + ep)
                elif ep % si == 0 or ep == num_episodes:
                    self.save_checkpoint(start_episode + ep)
                    if save_resume_state and (
                            ep % (resume_interval or chunk) < chunk
                            or ep == num_episodes):
                        self.save_resume_state(start_episode + ep)
                if (ep // chunk) % max(1, log_interval // chunk) == 0:
                    self._log(f"episode {ep}/{num_episodes}")
        finally:
            for t in ckpt_threads:   # durability before returning; join()
                t.join()             # re-raises worker errors (disk full...)

        return {
            "train_loss": train_loss,
            # Renamed from "reward_per_train_step" (pre-round-5 artifacts):
            # rewards are reduced ON DEVICE to per-train-step TOTALS
            # [C, S, 1], no longer per-transition [C, S, T*num_envs] — the
            # new key marks the semantic/shape change so old and new npz
            # artifacts cannot be confused.
            "reward_total_per_train_step": reward_per_step,
            "reward_per_episode": reward_per_episode,
            "train_q_mean": q_mean,
            "train_q_max_mean": q_max_mean,
            "orig_train_q_mean": orig_q_mean,
            "orig_train_q_max_mean": orig_q_max_mean,
        }

    # ------------------------------------------------------------------
    # Checkpointing (reference BS_brain.py:853-869 / 1244-1256)
    # ------------------------------------------------------------------
    def save_checkpoint(self, episode: int):
        path = ckpt.checkpoint_path(self.results_dir, episode)
        # rng_key makes resume EXACT: a resumed agent continues with the
        # same key sequence the uninterrupted run would have used (the
        # reference can only reload weights for evaluation — SURVEY.md §5).
        ckpt.save(path, self.state.params, self.state.target_params,
                  self.state.opt_state, episode=episode,
                  env_step=np.asarray(self.state.env_step),
                  rng_key=np.asarray(self.key))

    def load_checkpoint(self, episode: int, restore_rng: bool = False):
        path = ckpt.checkpoint_path(self.results_dir, episode)
        params, target, opt, scalars = ckpt.load(
            path, self.state.params, self.state.target_params,
            self.state.opt_state)
        self.state = self.state.replace(
            params=params, target_params=target,
            opt_state=opt if opt is not None else self.state.opt_state)
        if "env_step" in scalars:
            self.state = self.state.replace(
                env_step=jnp.asarray(scalars["env_step"], jnp.int32))
        if restore_rng and "rng_key" in scalars:
            self.key = jnp.asarray(scalars["rng_key"], jnp.uint32)

    def resume_state_path(self) -> str:
        return os.path.join(self.results_dir, "resume-latest.npz")

    def save_resume_state(self, episode: int):
        """Rolling full-state save (params + target + optimizer + replay
        ring + env_step + RNG position) for bit-exact crash resume."""
        ckpt.save_state(self.resume_state_path(), self.state,
                        episode=episode, rng_key=np.asarray(self.key))

    def resume_state_episode(self) -> Optional[int]:
        """Episode recorded in resume-latest.npz, without loading it."""
        path = self.resume_state_path()
        if not os.path.exists(path):
            return None
        with np.load(path, allow_pickle=False) as data:
            return int(data["scalar:episode"])

    def load_resume_state(self) -> Optional[int]:
        """Restore the full agent state from resume-latest.npz if present.
        Returns its episode number, or None."""
        path = self.resume_state_path()
        if not os.path.exists(path):
            return None
        state, scalars = ckpt.load_state(path, self.state)
        self.state = state
        if "rng_key" in scalars:
            self.key = jnp.asarray(scalars["rng_key"], jnp.uint32)
        return int(scalars["episode"])

    def latest_checkpoint_episode(self) -> Optional[int]:
        """Newest saved checkpoint episode, or None."""
        import glob
        import re
        pattern = os.path.join(self.results_dir, "checkpoint-episode-*.npz")
        episodes = []
        for p in glob.glob(pattern):
            m = re.search(r"checkpoint-episode-(\d+)\.npz$", p)
            if m:
                episodes.append(int(m.group(1)))
        return max(episodes) if episodes else None

    def resume_latest(self) -> int:
        """Failure recovery. Prefers resume-latest.npz (FULL state incl.
        the replay ring — continuation is then bit-exact vs the
        uninterrupted run, tests/test_harness.py::TestCrashResume);
        otherwise restores params + target + optimizer state + env-step
        counter + host RNG position from the newest checkpoint (replay
        restarts empty). The reference can only reload weights for
        evaluation — SURVEY.md §5. Returns the episode to continue from
        (0 if nothing saved)."""
        ckpt_episode = self.latest_checkpoint_episode()
        try:
            resume_episode = self.resume_state_episode()
            if resume_episode is not None and (
                    ckpt_episode is None or resume_episode >= ckpt_episode):
                self.load_resume_state()
                self._log(f"resumed full state at episode {resume_episode}")
                return resume_episode
        except (KeyError, ValueError):   # stale/incompatible resume file
            pass
        if ckpt_episode is None:
            return 0
        self.load_checkpoint(ckpt_episode, restore_rng=True)
        self._log(f"resumed from checkpoint at episode {ckpt_episode}")
        return ckpt_episode

    # ------------------------------------------------------------------
    # Testing (reference Agent.test_run, BS_brain.py:986-1162)
    # ------------------------------------------------------------------
    def _test_episode_impl(self, params, env_state, key, opt_flag: bool,
                           fixed_epsilon: float, num_steps: int):
        """One whole test episode under jit: per step compute the RA
        baseline, optionally the brute-force optimum over all joint actions,
        then the (fixed-epsilon-)greedy RL action which advances the env."""
        ec, mc, tc = self.env_cfg, self.model_cfg, self.train_cfg
        n, n_act = mc.n_nodes, mc.n_actions
        w_v2v, w_v2i = tc.v2v_weight, tc.v2i_weight
        all_actions = (enumerate_joint_actions(n, n_act)
                       if opt_flag else None)

        def step(env_state, k):
            k_ra, k_eps, k_rand, k_env = jax.random.split(k, 4)
            node, edge = features.node_edge_features(env_state, ec)
            adj = features.adjacency(env_state, ec)

            # Random-Action baseline (dump_act: no state change)
            ra_actions = policy.random_actions(k_ra, n, n_act)
            ra_v2v, ra_v2i, ra_intf = vehicular.dump_act(
                env_state, ra_actions[:, None], ec)
            ra_reward = (w_v2v * jnp.sum(ra_v2v) + w_v2i * jnp.sum(ra_v2i))

            # Brute-force optimal baseline over all A^N joint actions
            if opt_flag:
                bf_v2v, bf_v2i, bf_intf = jax.vmap(
                    lambda a: vehicular.dump_act(env_state, a[:, None], ec)
                )(all_actions)
                bf_rewards = (w_v2v * jnp.sum(bf_v2v, axis=(1, 2))
                              + w_v2i * jnp.sum(bf_v2i, axis=1))
                opt_idx = jnp.argmax(bf_rewards)
                opt = {"reward": bf_rewards[opt_idx],
                       "action_index": opt_idx,
                       "v2v_rate": jnp.sum(bf_v2v[opt_idx], axis=1),
                       "v2i_rate": bf_v2i[opt_idx],
                       "interference": bf_intf[opt_idx]}
            else:
                opt = {}

            # RL action: greedy, with optional fixed-epsilon exploration
            # (reference evaluator, BS_brain.py:1386-1406)
            q = gnn_dqn.apply_single(params, node, edge, adj, mc)
            greedy = policy.greedy_actions(q)
            rand = policy.random_actions(k_rand, n, n_act)
            explore = jax.random.uniform(k_eps) < fixed_epsilon
            actions = jnp.where(explore, rand, greedy)
            env_state, v2v, v2i, intf = vehicular.act(
                env_state, actions[:, None], k_env, ec)
            reward = w_v2v * jnp.sum(v2v) + w_v2i * jnp.sum(v2i)

            out = {"reward": reward, "v2v_rate": jnp.sum(v2v, axis=1),
                   "v2i_rate": v2i, "interference": intf,
                   "ra_reward": ra_reward,
                   "ra_v2v_rate": jnp.sum(ra_v2v, axis=1),
                   "ra_v2i_rate": ra_v2i, "ra_interference": ra_intf}
            out.update({f"opt_{k2}": v for k2, v in opt.items()})
            return env_state, out

        keys = jax.random.split(key, num_steps)
        _, traj = jax.lax.scan(step, env_state, keys)
        return traj

    def test_run(self, num_episodes: Optional[int] = None,
                 num_test_steps: Optional[int] = None,
                 opt_flag: Optional[bool] = None,
                 log_interval: int = 200) -> Dict[str, np.ndarray]:
        """Greedy evaluation vs Random-Action (and optionally brute-force
        Optimal); returns per-episode/step metric arrays with the reference's
        semantics (BS_brain.py:996-1162)."""
        ev = self.eval_cfg
        num_episodes = num_episodes or ev.num_episodes
        num_test_steps = num_test_steps or ev.num_test_steps
        opt_flag = ev.opt_flag if opt_flag is None else opt_flag

        # same key-consumption order as the per-episode loop (2 draws per
        # episode: game, then episode), batched per chunk
        chunk = max(1, min(getattr(self.eval_cfg, "episode_chunk", 100),
                           num_episodes))
        results = []
        done = 0
        while done < num_episodes:
            take = min(chunk, num_episodes - done)
            keys_game = []
            keys_ep = []
            for _ in range(take):
                keys_game.append(self._next_key())
                keys_ep.append(self._next_key())
            traj = self._test_episode_chunk(
                self.state.params, jnp.stack(keys_game), jnp.stack(keys_ep),
                opt_flag, 0.0, num_test_steps)
            results.append(jax.tree.map(np.asarray, traj))
            done += take
            if done % log_interval < take:
                self._log(f"test episode {done}/{num_episodes}")
        stacked = jax.tree.map(lambda *xs: np.concatenate(xs), *results)
        stacked["expect_return"] = stacked["reward"].sum(axis=1)
        stacked["ra_expect_return"] = stacked["ra_reward"].sum(axis=1)
        if opt_flag:
            stacked["opt_expect_return"] = stacked["opt_reward"].sum(axis=1)
        return stacked

    # ------------------------------------------------------------------
    # Checkpoint-history evaluation (reference
    # Agent.evaluate_training_diff_trials, BS_brain.py:1164-1451)
    # ------------------------------------------------------------------
    def _eval_ckpts_impl(self, params_stacked, env_state, key,
                         fixed_epsilon, num_steps: int):
        """Evaluate a [K, ...]-stacked bank of checkpoint weights on the SAME
        environment realization and key — one device program for K whole
        episodes (the reference reseeds the same per-trial seed before every
        checkpoint, BS_brain.py:1262-1266, so only the weights differ).
        Returns (return [K], ra_return [K])."""
        def one(params):
            traj = self._test_episode_impl(params, env_state, key, False,
                                           fixed_epsilon, num_steps)
            return traj["reward"].sum(), traj["ra_reward"].sum()

        return jax.vmap(one)(params_stacked)

    def load_checkpoint_history(self, num_episodes: int, interval: int):
        """Load every checkpoint's online params once and stack them into a
        single [K, ...] device pytree (the weights are tiny; the reference
        reloads each .h5 once per trial x checkpoint — BS_brain.py:1244-1256
        — which at its scale is 20,000 host I/O round trips)."""
        params_list = []
        for ci in range(num_episodes // interval):
            path = ckpt.checkpoint_path(self.results_dir,
                                        (ci + 1) * interval)
            params, _, _, _ = ckpt.load(path, self.state.params,
                                        self.state.target_params)
            params_list.append(params)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)

    def evaluate_training_diff_trials(
            self, num_episodes: Optional[int] = None,
            num_test_steps: Optional[int] = None, opt_flag: bool = False,
            fixed_epsilon: Optional[float] = None,
            num_trials: Optional[int] = None,
            ckpt_chunk: int = 256) -> Dict[str, np.ndarray]:
        """For each trial and each saved checkpoint (every
        `evaluation_episode_interval` training episodes), run one
        fixed-epsilon episode vs the RA baseline with a per-trial seed.

        The checkpoint history is loaded from disk ONCE, stacked on device,
        and each trial evaluates `ckpt_chunk` checkpoints per dispatch via
        vmap — versus the reference's one .h5 load + one predict-per-step
        host loop per (trial, checkpoint) (BS_brain.py:1220-1451).

        Returns per-(trial, checkpoint) return matrices."""
        ev = self.eval_cfg
        interval = ev.evaluation_episode_interval
        num_episodes = num_episodes or self.train_cfg.num_episodes
        num_ckpts = num_episodes // interval
        fixed_epsilon = (ev.fixed_epsilon if fixed_epsilon is None
                         else fixed_epsilon)
        num_trials = num_trials or ev.num_trials
        num_test_steps = num_test_steps or ev.num_test_steps

        history = self.load_checkpoint_history(num_episodes, interval)
        ret = np.zeros((num_trials, num_ckpts))
        ra_ret = np.zeros((num_trials, num_ckpts))
        opt_ret = np.zeros(num_trials)

        for trial in range(num_trials):
            self._log(f"evaluate trial {trial + 1}/{num_trials}")
            key = jax.random.PRNGKey(trial + 1)
            k_game, k_ep = jax.random.split(key)
            env_state = self._new_game(k_game, self.env_cfg)
            for lo in range(0, num_ckpts, ckpt_chunk):
                hi = min(lo + ckpt_chunk, num_ckpts)
                bank = jax.tree.map(lambda x: x[lo:hi], history)
                r, ra = self._eval_ckpts(bank, env_state, k_ep,
                                         fixed_epsilon, num_test_steps)
                ret[trial, lo:hi] = np.asarray(r)
                ra_ret[trial, lo:hi] = np.asarray(ra)
            if opt_flag:
                # Brute-force optimal ground truth once per trial on the
                # first checkpoint's episode (BS_brain.py:1284-1326).
                first = jax.tree.map(lambda x: x[0], history)
                traj = self._test_episode(first, env_state, k_ep, True,
                                          fixed_epsilon, num_test_steps)
                opt_ret[trial] = float(np.asarray(traj["opt_reward"]).sum())

        return {"evaluation_return_per_episode": ret,
                "ra_expect_return": ra_ret,
                "opt_expect_return": opt_ret}
