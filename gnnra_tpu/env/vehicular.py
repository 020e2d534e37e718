"""Functional V2X environment: state pytree + pure transition functions.

TPU-native re-design of `class Environ` (reference Environment.py:179-506).
The reference holds mutable Python objects (Vehicle lists, channel-model
instances) and steps them with scalar loops; here the environment is a single
`EnvState` array pytree and every transition is a pure jittable function of
(state, key, cfg) that `vmap`s over batched environments and runs under
`lax.scan` inside the training loop.

Reward / interference math (the SDDMM-like hot kernel of the reference,
Environment.py:406-493) is expressed as gathers + one-hot matmuls that XLA
maps onto the MXU/VPU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from gnnra_tpu.config import EnvConfig
from gnnra_tpu.env import channels, mobility


class EnvState(struct.PyTreeNode):
    """All mutable simulator state as arrays (shapes for N vehicles, R RBs,
    M neighbors)."""

    positions: jax.Array       # [N, 2]
    directions: jax.Array      # [N] int32
    velocities: jax.Array      # [N]
    shadow_v2v: jax.Array      # [N, N] dB
    shadow_v2i: jax.Array      # [N] dB
    v2v_abs: jax.Array         # [N, N] pathloss+shadow(+50 dB diag) dB
    v2i_abs: jax.Array         # [N] dB
    v2v_fast: jax.Array        # [N, N, R] fading dB (subtracted)
    v2i_fast: jax.Array        # [N, R]
    destinations: jax.Array    # [N, M] int32 receiver per (tx, neighbor)
    activate_links: jax.Array  # [N, M] bool
    v2v_interference_db: jax.Array  # [N, M, R] observation (Compute_Interference)
    step: jax.Array            # [] int32



# 10**(x/10) as a fused exp: XLA lowers a generic `pow` through a
# multi-op log/exp path; the explicit form is one multiply + one exp and
# measured faster in the batched reward phase (config-3 decomposition,
# docs/RESULTS.md round 4). Numerically within 1-2 ulp of `10 ** (x/10)`
# (golden tests carry tolerances; rollout equality tests compare programs
# that both use this form).
_LN10_OVER_10 = 0.23025850929940458


def _db_to_lin(x_db):
    return jnp.exp(x_db * _LN10_OVER_10)


# ---------------------------------------------------------------------------
# Derived channel tensors
# ---------------------------------------------------------------------------

def v2v_channels_with_fastfading(state: EnvState) -> jax.Array:
    """[N, N, R] composite V2V loss (reference Environment.py:401-402)."""
    return state.v2v_abs[:, :, None] - state.v2v_fast


def v2i_channels_with_fastfading(state: EnvState) -> jax.Array:
    """[N, R] composite V2I loss (reference Environment.py:403-404)."""
    return state.v2i_abs[:, None] - state.v2i_fast


# ---------------------------------------------------------------------------
# Channel refresh
# ---------------------------------------------------------------------------

def renew_channels_fastfading(state: EnvState, key: jax.Array,
                              cfg: EnvConfig) -> EnvState:
    """Refresh pathloss, AR(1) shadowing, and Rayleigh fast fading.

    Mirrors `renew_channel` + `renew_channels_fastfading` (reference
    Environment.py:378-404): shadowing advances with delta = 0.002*velocity
    and the V2V diagonal gets a +50 dB self-interference guard.
    """
    n = state.positions.shape[0]
    k_sv, k_si, k_fv, k_fi = jax.random.split(key, 4)

    pl_v2v = channels.v2v_pathloss(state.positions, cfg)
    pl_v2i = channels.v2i_pathloss(state.positions, cfg)

    delta = cfg.shadow_delta_factor * state.velocities
    # V2V AR(1) distance is d_i + d_j (reference Environment.py:70-74).
    dd_v2v = delta[:, None] + delta[None, :]
    shadow_v2v = channels.ar1_shadow_update(
        state.shadow_v2v, dd_v2v, cfg.v2v_decorrelation_distance,
        cfg.v2v_shadow_std, k_sv)
    shadow_v2i = channels.ar1_shadow_update(
        state.shadow_v2i, delta, cfg.v2i_decorrelation_distance,
        cfg.v2i_shadow_std, k_si)

    v2v_abs = pl_v2v + shadow_v2v + 50.0 * jnp.eye(n)
    v2i_abs = pl_v2i + shadow_v2i
    v2v_fast = channels.rayleigh_fading_db(k_fv, (n, n, cfg.n_rb))
    v2i_fast = channels.rayleigh_fading_db(k_fi, (n, cfg.n_rb))

    return state.replace(shadow_v2v=shadow_v2v, shadow_v2i=shadow_v2i,
                         v2v_abs=v2v_abs, v2i_abs=v2i_abs,
                         v2v_fast=v2v_fast, v2i_fast=v2i_fast)


def update_large_fading(state: EnvState, key: jax.Array, cfg: EnvConfig,
                        time_step: float) -> EnvState:
    """Pathloss + AR(1) shadowing refresh with an explicit time step
    (reference `update_large_fading`, Environment.py:347-354; the main loop
    uses the 0.002 factor via renew_channels_fastfading instead)."""
    k_sv, k_si = jax.random.split(key)
    pl_v2v = channels.v2v_pathloss(state.positions, cfg)
    pl_v2i = channels.v2i_pathloss(state.positions, cfg)
    delta = time_step * state.velocities
    dd_v2v = delta[:, None] + delta[None, :]
    shadow_v2v = channels.ar1_shadow_update(
        state.shadow_v2v, dd_v2v, cfg.v2v_decorrelation_distance,
        cfg.v2v_shadow_std, k_sv)
    shadow_v2i = channels.ar1_shadow_update(
        state.shadow_v2i, delta, cfg.v2i_decorrelation_distance,
        cfg.v2i_shadow_std, k_si)
    n = state.positions.shape[0]
    return state.replace(
        shadow_v2v=shadow_v2v, shadow_v2i=shadow_v2i,
        v2v_abs=pl_v2v + shadow_v2v + 50.0 * jnp.eye(n),
        v2i_abs=pl_v2i + shadow_v2i)


def update_small_fading(state: EnvState, key: jax.Array,
                        cfg: EnvConfig) -> EnvState:
    """Rayleigh fast-fading refresh only (reference `update_small_fading`,
    Environment.py:356-358)."""
    n = state.positions.shape[0]
    k_fv, k_fi = jax.random.split(key)
    return state.replace(
        v2v_fast=channels.rayleigh_fading_db(k_fv, (n, n, cfg.n_rb)),
        v2i_fast=channels.rayleigh_fading_db(k_fi, (n, cfg.n_rb)))


def renew_neighbor(state: EnvState, key: jax.Array, cfg: EnvConfig) -> EnvState:
    """Pick each transmitter's receiver(s) — the interference-graph edges.

    Mirrors `renew_neighbor` (reference Environment.py:360-376): sort vehicles
    by distance; destinations are n_neighbor distinct samples from the
    candidates sorted[1 : N-2] (self and the two farthest excluded).
    """
    n = state.positions.shape[0]
    z = state.positions[:, 0] + 1j * state.positions[:, 1]
    dist = jnp.abs(z[:, None] - z[None, :])
    # sort_idx[:, i] in the reference sorts column i; symmetric matrix so
    # sorting rows is identical.
    order = jnp.argsort(dist, axis=1)              # [N, N] nearest-first, self at 0
    candidates = order[:, 1:n - 2]                 # [N, N-3]
    keys = jax.random.split(key, n)

    def pick(k, cand):
        perm = jax.random.permutation(k, cand.shape[0])
        return cand[perm[:cfg.n_neighbor]]

    destinations = jax.vmap(pick)(keys, candidates).astype(jnp.int32)
    return state.replace(destinations=destinations)


# ---------------------------------------------------------------------------
# Reward / rate engine
# ---------------------------------------------------------------------------

def compute_reward_with_channel_selection(
        state: EnvState, actions: jax.Array, cfg: EnvConfig
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Shannon rates for a joint channel selection.

    Vectorizes `compute_reward_with_channel_selection` (reference
    Environment.py:406-458). actions: [N, M] int RB choice per link.

    Precondition: actions must lie in [0, R) — OR be masked out by
    `state.activate_links` wherever they don't. The combined
    (dest, action) one-hot over the flattened dest*R+action axis below
    aliases out-of-range actions into valid table entries (e.g. the
    reference's -1 inactive-link sentinel with dest>=1 would select
    ff[dest-1, R-1]); every use of the resulting `gain` is multiplied by
    `active`, so masked links are safe, but unmasked out-of-range actions
    are NOT independently tolerated the way a per-axis one_hot(actions, R)
    would zero them. All in-repo callers pass valid [0, R) actions.

    Returns:
      v2v_rate [N, M], v2i_rate [min(R,N)], v2i_interference_at_bs [R]
      (the last one *without* the noise floor, as the reference returns it).
    """
    n, m = actions.shape
    r = cfg.n_rb
    v2v_ff = v2v_channels_with_fastfading(state)   # [N, N, R]
    v2i_ff = v2i_channels_with_fastfading(state)   # [N, R]
    p_v2v = cfg.v2v_power_levels_dbm[cfg.fixed_v2v_power_index]
    active = state.activate_links                  # [N, M] bool
    dest = state.destinations                      # [N, M]

    # All channel selections below are expressed as one-hot CONTRACTIONS
    # instead of advanced-index gathers: under the config-3 vmap
    # ([T*E]-batched tiny tensors) XLA's batched fancy-gather was the
    # reward phase's dominant cost (decomposition, docs/RESULTS.md
    # round 4); tiny einsums fuse and batch cleanly. HIGHEST precision is
    # required — ~100 dB channel values lose ~0.5 dB in a bf16 multiply.
    hi = jax.lax.Precision.HIGHEST
    onehot = jax.nn.one_hot(actions, r, dtype=v2v_ff.dtype)     # [N, M, R]

    # --- V2I interference at the BS, accumulated per selected RB
    # (Environment.py:413-421): one-hot segment-sum onto the RB axis.
    v2i_gain = jnp.einsum("nr,nmr->nm", v2i_ff, onehot,
                          precision=hi)                         # [N, M]
    v2i_term = _db_to_lin(p_v2v - v2i_gain + cfg.veh_ant_gain
                          + cfg.bs_ant_gain - cfg.bs_noise_figure)
    v2i_interference = jnp.einsum("nm,nmr->r", v2i_term * active, onehot,
                                  precision=hi)
    v2i_interference_total = v2i_interference + cfg.sig2

    # --- pairwise gain table, computed once for signal AND interference:
    # gain[l, t] = ff[tx_t, dest_l, action_l], via ONE combined
    # (dest, action) one-hot over the flattened [N*R] trailing axes (the
    # profile showed the two-one-hot form "tbc,lb,lc->lt" plus its layout
    # copies at ~0.8 ms of the config-3 step; one contraction halves the
    # work and drops the 5-D intermediates). For m == 1 the tx axis is
    # already link-ordered, so the link->tx contraction is an identity.
    L = n * m
    onehot_tx = jax.nn.one_hot(
        jnp.arange(L) // m, n, dtype=v2v_ff.dtype)              # [L, N]
    ff_t = v2v_ff if m == 1 else jnp.einsum(
        "abc,ta->tbc", v2v_ff, onehot_tx, precision=hi)         # [L, N, R]
    oj = jax.nn.one_hot(dest.reshape(-1) * r + actions.reshape(-1),
                        n * r, dtype=v2v_ff.dtype)              # [L, N*R]
    gain = jnp.einsum("tj,lj->lt", ff_t.reshape(L, n * r), oj,
                      precision=hi)                             # [L, L]

    # --- V2V link signal (Environment.py:430-433): ff[tx_l, dest_l,
    # action_l] is the diagonal of the pairwise table.
    g_sig = jnp.einsum("ll->l", gain).reshape(n, m)
    link_gain_const = 2.0 * cfg.veh_ant_gain - cfg.veh_noise_figure
    v2v_signal = active * _db_to_lin(p_v2v - g_sig + link_gain_const)

    # --- V2I -> V2V cross interference (Environment.py:434-438): the V2I
    # transmitter on RB b is modeled as vehicle row b (only when b < N).
    rb_ok = actions < n
    # ff_rdiag[r_, b] = v2v_ff[r_, b, r_] (the RB-as-vehicle-row quirk)
    ff_rdiag = jnp.einsum("abr,ar->rb", v2v_ff,
                          jnp.eye(n, r, dtype=v2v_ff.dtype), precision=hi)
    # g_cross[l] = ff_rdiag[action_l, dest_l]: one combined one-hot over
    # the flattened [R*N] table (same rewrite as `gain` above).
    ocross = jax.nn.one_hot(actions.reshape(-1) * n + dest.reshape(-1),
                            r * n, dtype=v2v_ff.dtype)          # [L, R*N]
    g_cross = jnp.einsum("j,lj->l", ff_rdiag.reshape(-1), ocross,
                         precision=hi).reshape(n, m)
    cross = rb_ok * active * _db_to_lin(cfg.v2i_power_dbm - g_cross
                                        + link_gain_const)

    # --- pairwise co-channel V2V interference (Environment.py:440-451):
    # links flattened to L = N*M; interference at link l from every other
    # active link l2 sharing its RB, with gain[l, l2] from the pairwise
    # table computed above.
    rb_f = actions.reshape(-1)
    act_f = active.reshape(-1)
    same_rb = rb_f[:, None] == rb_f[None, :]
    pair_mask = (same_rb & act_f[:, None] & act_f[None, :]
                 & ~jnp.eye(L, dtype=bool))
    v2v_interf = jnp.sum(
        pair_mask * _db_to_lin(p_v2v - gain + link_gain_const), axis=1)
    v2v_interf = v2v_interf.reshape(n, m) + cross
    v2v_interference_total = v2v_interf + cfg.sig2

    v2v_rate = jnp.log2(1.0 + v2v_signal / v2v_interference_total)

    # --- V2I rates (Environment.py:453-456): the first min(R, N) vehicles
    # are the V2I uplink transmitters, one per RB.
    k = min(r, n)
    v2i_signal_db = (cfg.v2i_power_dbm - state.v2i_abs[:k] + cfg.veh_ant_gain
                     + cfg.bs_ant_gain - cfg.bs_noise_figure)
    v2i_rate = jnp.log2(1.0 + _db_to_lin(v2i_signal_db)
                        / v2i_interference_total[:k])

    return v2v_rate, v2i_rate, v2i_interference


def compute_interference_obs(state: EnvState, actions: jax.Array,
                             cfg: EnvConfig) -> jax.Array:
    """Next-state interference observation [N, M, R] in dB.

    Vectorizes `Compute_Interference` (reference Environment.py:460-493),
    including its behavior quirk: the V2V-to-V2V accumulation is skipped for
    every *active* link (the guard `channel_selection[i,j] >= 0` at
    Environment.py:486), so with all links active only the V2I term and the
    noise floor contribute. Inactive links (selection -1) fall through and
    accumulate onto RB index -1 == R-1 — reproduced under faithful_quirks.
    """
    n, m = actions.shape
    r = cfg.n_rb
    v2v_ff = v2v_channels_with_fastfading(state)
    dest = state.destinations
    link_gain_const = 2.0 * cfg.veh_ant_gain - cfg.veh_noise_figure

    interf = jnp.full((n, m, r), cfg.sig2)

    # V2I term (Environment.py:471-480): for RB i the V2I transmitter is
    # vehicle row i of the V2V channel tensor. Requires R <= N (true for the
    # reference configs where R == N).
    assert r <= n, "interference observation assumes n_rb <= n_veh (as reference)"
    # (unlike the reward engine, these gathers measured FASTER than their
    # one-hot contraction forms in the config-3 step — A/B'd in round 4:
    # the [N, M, R]-shaped direct gather vectorizes fine, and the obs runs
    # once per stacked state where the contraction setup cost repeats)
    rb_idx = jnp.arange(r)
    # g[k, m_, i] = v2v_ff[i, dest[k, m_], i]
    g = v2v_ff[rb_idx[None, None, :], dest[:, :, None], rb_idx[None, None, :]]
    interf = interf + _db_to_lin(cfg.v2i_power_dbm - g + link_gain_const)

    if cfg.faithful_quirks:
        # Dead-code branch reproduced: inactive links (i,j) add their power to
        # every other vehicle's observation on RB -1 (the last RB), with the
        # channel also sampled at RB -1 (Environment.py:482-491).
        p_v2v = cfg.v2v_power_levels_dbm[cfg.fixed_v2v_power_index]
        sel = jnp.where(state.activate_links, actions, -1)
        inactive = sel < 0                                # [N, M] contributors
        # contribution of link (i,j) to obs (k, m_): gain v2v_ff[i, dest[k,m_], -1]
        g_last = v2v_ff[:, :, r - 1]                      # [N(tx), N(rx)]
        contrib = _db_to_lin(p_v2v - g_last[:, dest]
                             + link_gain_const)           # [N(tx), N(rx=k), M]
        not_self = ~jnp.eye(n, dtype=bool)                # i != k
        weight = (inactive.sum(axis=1)[:, None] * not_self)  # [N(tx), N(k)]
        add_last = jnp.einsum("ik,ikm->km", weight.astype(contrib.dtype),
                              contrib * not_self[:, :, None])
        interf = interf.at[:, :, r - 1].add(add_last)

    return 10.0 * jnp.log10(interf)


# ---------------------------------------------------------------------------
# Episode reset and environment step
# ---------------------------------------------------------------------------

def new_random_game(key: jax.Array, cfg: EnvConfig) -> EnvState:
    """Fresh episode (reference `new_random_game`, Environment.py:495-506):
    respawn vehicles, fresh shadowing, refresh channels, pick neighbors,
    activate all links."""
    n = cfg.n_veh
    k_spawn, k_shadow_v, k_shadow_i, k_chan, k_nbr = jax.random.split(key, 5)
    positions, directions, velocities = mobility.spawn_vehicles(k_spawn, cfg)
    # Fresh shadow realizations (channel objects are re-created at reset,
    # Environment.py:502-503 -> V2Vchannels.__init__ -> update_shadow([])).
    shadow_v2v = cfg.v2v_shadow_std * jax.random.normal(k_shadow_v, (n, n))
    shadow_v2i = cfg.v2i_shadow_std * jax.random.normal(k_shadow_i, (n,))
    state = EnvState(
        positions=positions, directions=directions, velocities=velocities,
        shadow_v2v=shadow_v2v, shadow_v2i=shadow_v2i,
        v2v_abs=jnp.zeros((n, n)), v2i_abs=jnp.zeros((n,)),
        v2v_fast=jnp.zeros((n, n, cfg.n_rb)), v2i_fast=jnp.zeros((n, cfg.n_rb)),
        destinations=jnp.zeros((n, cfg.n_neighbor), dtype=jnp.int32),
        activate_links=jnp.ones((n, cfg.n_neighbor), dtype=bool),
        v2v_interference_db=jnp.full((n, cfg.n_neighbor, cfg.n_rb),
                                     10.0 * jnp.log10(jnp.asarray(cfg.sig2))),
        step=jnp.zeros((), jnp.int32))
    state = renew_channels_fastfading(state, k_chan, cfg)
    state = renew_neighbor(state, k_nbr, cfg)
    return state


def act(state: EnvState, actions: jax.Array, key: jax.Array, cfg: EnvConfig
        ) -> Tuple[EnvState, jax.Array, jax.Array, jax.Array]:
    """Execute a joint action: reward, then advance the world.

    Mirrors `Agent.act` (reference BS_brain.py:366-376): reward on the current
    channels, then mobility -> channel refresh -> interference observation.

    Returns (next_state, v2v_rate [N,M], v2i_rate [K], v2i_interference [R]).
    """
    k_mob, k_chan = jax.random.split(key)
    v2v_rate, v2i_rate, interference = compute_reward_with_channel_selection(
        state, actions, cfg)
    positions, directions = mobility.renew_positions(
        state.positions, state.directions, state.velocities, k_mob, cfg)
    state = state.replace(positions=positions, directions=directions,
                          step=state.step + 1)
    state = renew_channels_fastfading(state, k_chan, cfg)
    state = state.replace(
        v2v_interference_db=compute_interference_obs(state, actions, cfg))
    return state, v2v_rate, v2i_rate, interference


def dump_act(state: EnvState, actions: jax.Array, cfg: EnvConfig
             ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Reward only, no state change (reference `dump_act`, BS_brain.py:378-383).
    Used by the Random-Action and brute-force-Optimal baselines."""
    return compute_reward_with_channel_selection(state, actions, cfg)


# ---------------------------------------------------------------------------
# Hoisted (action-independent) channel trajectory
# ---------------------------------------------------------------------------

class ChannelTrajectory(struct.PyTreeNode):
    """Precomputed channel evolution for a burst of T transitions.

    Entry [t] is the world state AFTER transition t — what the interference
    observation and the next-state features see. Produced by
    `precompute_channel_trajectory`; consumed step-by-step (as `lax.scan` xs)
    by `apply_precomputed_transition`.
    """

    positions: jax.Array    # [T, N, 2]
    directions: jax.Array   # [T, N] int32
    shadow_v2v: jax.Array   # [T, N, N]
    shadow_v2i: jax.Array   # [T, N]
    v2v_abs: jax.Array      # [T, N, N]
    v2i_abs: jax.Array      # [T, N]
    v2v_fast: jax.Array     # [T, N, N, R]
    v2i_fast: jax.Array     # [T, N, R]


def ar1_chain(s0: jax.Array, rho: jax.Array, noise: jax.Array) -> jax.Array:
    """All T states of the AR(1) recurrence s_t = rho*s_{t-1} + c*n_t,
    c = sqrt(1-rho^2), computed in O(log T) batched steps.

    Valid whenever rho is constant over the burst — true here because
    shadowing's delta-distance is velocity*factor and velocities are
    constant within an episode (mobility only changes positions/directions,
    reference Environment.py:236-345). The recurrence is a composition of
    affine maps x -> a*x + b, which is associative, so `associative_scan`
    turns the T-step serial chain into a tree of fused elementwise ops.

    Args: s0 [...], rho broadcastable to noise[t], noise [T, ...] ALREADY
    scaled by the shadowing std. Returns [T, ...].
    """
    c = jnp.sqrt(1.0 - rho ** 2)
    a = jnp.broadcast_to(rho, noise.shape)
    b = c * noise

    def combine(l, r):
        # apply l (earlier) then r (later): x -> a_r*(a_l*x + b_l) + b_r
        a_l, b_l = l
        a_r, b_r = r
        return a_l * a_r, a_r * b_l + b_r

    a_cum, b_cum = jax.lax.associative_scan(combine, (a, b))
    return a_cum * s0[None] + b_cum


def precompute_channel_trajectory(state: EnvState, key: jax.Array,
                                  cfg: EnvConfig, t_steps: int
                                  ) -> ChannelTrajectory:
    """Precompute T transitions of mobility + channel evolution in batch.

    Actions influence ONLY the reward and the interference observation
    (reference BS_brain.py:366-376: `act` = reward, then positions ->
    channels -> interference obs, none of which read the action except the
    obs) — so the whole channel chain for a rollout burst hoists out of the
    policy loop:

      * mobility stays a scan (genuinely sequential) of cheap masked ops;
      * pathloss evaluates for all T positions in one vmapped pass;
      * AR(1) shadowing collapses to an associative scan (`ar1_chain`);
      * all T Rayleigh fading tensors come from ONE PRNG draw each, paying
        the threefry hashing cost once instead of per transition.

    The per-step math is identical to `renew_channels_fastfading`; only the
    PRNG stream alignment differs (one batched draw vs T sequential splits),
    which is equal in distribution.
    """
    n = state.positions.shape[0]
    k_mob, k_sv, k_si, k_fv, k_fi = jax.random.split(key, 5)

    def mob_step(carry, u):
        pos, dirs = carry
        pos, dirs = mobility.renew_positions_from_draws(
            pos, dirs, state.velocities, u, cfg)
        return (pos, dirs), (pos, dirs)

    # The mobility chain is the one genuinely sequential piece; at parity
    # scale its 50 tiny masked-op iterations are ~30% of device step time.
    # The turn-decision uniforms for all T steps come from ONE batched
    # draw (same hoisting as the noise tensors below; per-step in-scan
    # threefry was ~35 us/step of pure hash chains). Unrolling the scan
    # was A/B'd (round-4 device-time profile) and LOST: rolled 341
    # us/step, unroll=5 379, unroll=True 375 — the unrolled forms trade
    # the small while-loop overhead for worse fusion/scheduling.
    u_mob = jax.random.uniform(
        k_mob, (t_steps, n, 2, len(cfg.up_lanes)))
    _, (positions, directions) = jax.lax.scan(
        mob_step, (state.positions, state.directions), u_mob)

    pl_v2v = jax.vmap(lambda p: channels.v2v_pathloss(p, cfg))(positions)
    pl_v2i = jax.vmap(lambda p: channels.v2i_pathloss(p, cfg))(positions)

    delta = cfg.shadow_delta_factor * state.velocities
    rho_v2v = jnp.exp(-(delta[:, None] + delta[None, :])
                      / cfg.v2v_decorrelation_distance)
    rho_v2i = jnp.exp(-delta / cfg.v2i_decorrelation_distance)
    noise_v2v = cfg.v2v_shadow_std * jax.random.normal(k_sv, (t_steps, n, n))
    noise_v2i = cfg.v2i_shadow_std * jax.random.normal(k_si, (t_steps, n))
    shadow_v2v = ar1_chain(state.shadow_v2v, rho_v2v, noise_v2v)
    shadow_v2i = ar1_chain(state.shadow_v2i, rho_v2i, noise_v2i)

    return ChannelTrajectory(
        positions=positions, directions=directions,
        shadow_v2v=shadow_v2v, shadow_v2i=shadow_v2i,
        v2v_abs=pl_v2v + shadow_v2v + 50.0 * jnp.eye(n)[None],
        v2i_abs=pl_v2i + shadow_v2i,
        v2v_fast=channels.rayleigh_fading_db(k_fv, (t_steps, n, n, cfg.n_rb)),
        v2i_fast=channels.rayleigh_fading_db(k_fi, (t_steps, n, cfg.n_rb)))


def traj_entry(traj: ChannelTrajectory, t) -> ChannelTrajectory:
    """Slice entry [t] (for callers not consuming the trajectory via scan)."""
    return jax.tree.map(lambda x: x[t], traj)


def apply_precomputed_transition(
        state: EnvState, traj_t: ChannelTrajectory, actions: jax.Array,
        cfg: EnvConfig
) -> Tuple[EnvState, jax.Array, jax.Array, jax.Array]:
    """`act` with the world-advance read from a precomputed trajectory slice.

    Same step semantics as `act` (reward on current channels, then advance,
    then the action-dependent interference observation); only the
    action-independent parts come from `traj_t` (one un-stacked [t] entry).
    """
    v2v_rate, v2i_rate, interference = compute_reward_with_channel_selection(
        state, actions, cfg)
    state = state.replace(
        positions=traj_t.positions, directions=traj_t.directions,
        shadow_v2v=traj_t.shadow_v2v, shadow_v2i=traj_t.shadow_v2i,
        v2v_abs=traj_t.v2v_abs, v2i_abs=traj_t.v2i_abs,
        v2v_fast=traj_t.v2v_fast, v2i_fast=traj_t.v2i_fast,
        step=state.step + 1)
    state = state.replace(
        v2v_interference_db=compute_interference_obs(state, actions, cfg))
    return state, v2v_rate, v2i_rate, interference
