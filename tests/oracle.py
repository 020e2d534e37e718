"""NumPy oracle: independent scalar-loop transcription of the reference
semantics (Environment.py formulas) used as ground truth for the vectorized
JAX implementation. Deliberately written in the most literal, loop-heavy style
so that each test compares two independently-derived implementations.
"""

import math

import numpy as np


# ---------------------------------------------------------------------------
# Pathloss (reference Environment.py:93-120, 140-146)
# ---------------------------------------------------------------------------

def v2v_pathloss_scalar(pos_a, pos_b, fc=2.0, h_bs=1.5, h_ms=1.5):
    d1 = abs(pos_a[0] - pos_b[0])
    d2 = abs(pos_a[1] - pos_b[1])
    d = math.hypot(d1, d2) + 0.001
    d_bp = 4 * (h_bs - 1) * (h_ms - 1) * fc * 1e9 / 3e8

    def pl_los(dd):
        if dd <= 3:
            return 22.7 * np.log10(3) + 41 + 20 * np.log10(fc / 5)
        if dd < d_bp:
            return 22.7 * np.log10(dd) + 41 + 20 * np.log10(fc / 5)
        return (40.0 * np.log10(dd) + 9.45 - 17.3 * np.log10(h_bs)
                - 17.3 * np.log10(h_ms) + 2.7 * np.log10(fc / 5))

    def pl_nlos(d_a, d_b):
        n_j = max(2.8 - 0.0024 * d_b, 1.84)
        return (pl_los(d_a) + 20 - 12.5 * n_j + 10 * n_j * np.log10(d_b)
                + 3 * np.log10(fc / 5))

    if min(d1, d2) < 7:
        return pl_los(d)
    return min(pl_nlos(d1, d2), pl_nlos(d2, d1))


def v2v_pathloss_matrix(positions):
    n = len(positions)
    out = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            out[i, j] = v2v_pathloss_scalar(positions[i], positions[j])
    return out


def v2i_pathloss_vector(positions, bs_pos=(375.0, 649.5), h_bs=25.0, h_ms=1.5):
    n = len(positions)
    out = np.zeros(n)
    for i in range(n):
        d1 = abs(positions[i][0] - bs_pos[0])
        d2 = abs(positions[i][1] - bs_pos[1])
        dist = math.hypot(d1, d2)
        out[i] = 128.1 + 37.6 * np.log10(
            math.sqrt(dist ** 2 + (h_bs - h_ms) ** 2) / 1000)
    return out


# ---------------------------------------------------------------------------
# Reward engine (reference Environment.py:406-458)
# ---------------------------------------------------------------------------

def compute_reward(actions, destinations, activate_links, v2v_ff, v2i_ff,
                   v2i_abs, *, n_rb, v2v_power_db=10.0, v2i_power_db=23.0,
                   sig2_db=-114.0, veh_ant=3.0, veh_nf=9.0, bs_ant=8.0,
                   bs_nf=5.0):
    """Scalar-loop transcription. actions [N, M] ints; v2v_ff [N, N, R]."""
    n, m = actions.shape
    sig2 = 10 ** (sig2_db / 10)
    acts = actions.copy()

    interference = np.zeros(n_rb)
    for i in range(n):
        for j in range(m):
            if not activate_links[i, j]:
                continue
            interference[acts[i, j]] += 10 ** ((v2v_power_db
                                                - v2i_ff[i, acts[i, j]]
                                                + veh_ant + bs_ant - bs_nf) / 10)
    v2i_interference_total = interference + sig2

    acts[~activate_links] = -1
    v2v_interf = np.zeros((n, m))
    v2v_signal = np.zeros((n, m))
    for rb in range(n_rb):
        idx = np.argwhere(acts == rb)
        for j in range(len(idx)):
            ti, tj = idx[j]
            rx_j = destinations[ti, tj]
            v2v_signal[ti, tj] = 10 ** ((v2v_power_db - v2v_ff[ti, rx_j, rb]
                                         + 2 * veh_ant - veh_nf) / 10)
            if rb < n:
                v2v_interf[ti, tj] += 10 ** ((v2i_power_db
                                              - v2v_ff[rb, rx_j, rb]
                                              + 2 * veh_ant - veh_nf) / 10)
            for k in range(j + 1, len(idx)):
                ki, kj = idx[k]
                rx_k = destinations[ki, kj]
                v2v_interf[ti, tj] += 10 ** ((v2v_power_db
                                              - v2v_ff[ki, rx_j, rb]
                                              + 2 * veh_ant - veh_nf) / 10)
                v2v_interf[ki, kj] += 10 ** ((v2v_power_db
                                              - v2v_ff[ti, rx_k, rb]
                                              + 2 * veh_ant - veh_nf) / 10)
    v2v_total = v2v_interf + sig2
    v2v_rate = np.log2(1 + v2v_signal / v2v_total)

    k_lim = min(n_rb, n)
    v2i_sig_db = (v2i_power_db - v2i_abs[:k_lim] + veh_ant + bs_ant - bs_nf)
    v2i_rate = np.log2(1 + 10 ** (v2i_sig_db / 10)
                       / v2i_interference_total[:k_lim])
    return v2v_rate, v2i_rate, interference


# ---------------------------------------------------------------------------
# Interference observation (reference Environment.py:460-493)
# ---------------------------------------------------------------------------

def compute_interference_obs(actions, destinations, activate_links, v2v_ff, *,
                             n_rb, v2v_power_db=10.0, v2i_power_db=23.0,
                             sig2_db=-114.0, veh_ant=3.0, veh_nf=9.0):
    n, m = actions.shape
    sig2 = 10 ** (sig2_db / 10)
    interf = np.zeros((n, m, n_rb)) + sig2
    sel = actions.copy()
    sel[~activate_links] = -1
    for rb in range(n_rb):
        for k in range(n):
            for mm in range(m):
                interf[k, mm, rb] += 10 ** ((v2i_power_db
                                             - v2v_ff[rb, destinations[k, mm], rb]
                                             + 2 * veh_ant - veh_nf) / 10)
    for i in range(n):
        for j in range(m):
            for k in range(n):
                for mm in range(m):
                    if (i == k) or (sel[i, j] >= 0):
                        continue
                    interf[k, mm, sel[i, j]] += 10 ** (
                        (v2v_power_db
                         - v2v_ff[i, destinations[k, mm], sel[i, j]]
                         + 2 * veh_ant - veh_nf) / 10)
    return 10 * np.log10(interf)


# ---------------------------------------------------------------------------
# Featurizer (reference BS_brain.py:389-407)
# ---------------------------------------------------------------------------

def get_state(i, j, destinations, v2v_ff, v2i_ff, n_d2d):
    a, b = 80.0, 60.0
    d = destinations[i][j]
    v2v_channel = (v2v_ff[i, d, :] - a) / b
    v2i_channel = (v2i_ff[i, :] - a) / b
    v2v_edge = (((np.sum(v2v_ff[:, d, :], axis=0) - v2v_ff[d, d, :])
                 - (n_d2d - 1) * a) / b - v2v_channel) / (n_d2d - 2)
    return v2v_channel, v2i_channel, v2v_edge
