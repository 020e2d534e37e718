"""Vectorized V2X channel models (pathloss, shadowing, fast fading).

TPU-native re-design of the reference's scalar-loop channel simulators:
  * `V2Vchannels` (reference Environment.py:45-120) — WINNER+ B1 Manhattan
    LOS/NLOS pathloss, AR(1) log-normal shadowing, per-RB Rayleigh fading.
  * `V2Ichannels` (reference Environment.py:123-165) — cellular pathloss to a
    fixed BS, shadowing, Rayleigh fading.
  * `RandomGenerate` (reference Environment.py:9-42) — scalar `random.gauss`
    loops, replaced here by JAX PRNG normals (equal in distribution).

Everything is a pure function of arrays + an explicit PRNG key: O(N^2·RB)
element-wise math that XLA fuses into a handful of VPU kernels instead of
Python triple loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnnra_tpu.config import EnvConfig


def v2v_pathloss(positions: jax.Array, cfg: EnvConfig) -> jax.Array:
    """Pairwise V2V pathloss matrix [N, N] in dB.

    Vectorizes `V2Vchannels.get_path_loss` (reference Environment.py:93-120):
    WINNER+ B1 with LOS when the Manhattan x- or y-separation is < 7 m,
    otherwise the min of the two NLOS around-the-corner branches.

    Note: the reference also mutates `shadow_std` (3 LOS / 4 NLOS) per scalar
    call; because the last call of its double loop is always the (N-1,N-1)
    self-pair (LOS), the effective std is the constant 3 — we keep the
    constant (cfg.v2v_shadow_std).
    """
    fc = cfg.v2v_fc_ghz
    d1 = jnp.abs(positions[:, None, 0] - positions[None, :, 0])
    d2 = jnp.abs(positions[:, None, 1] - positions[None, :, 1])
    d = jnp.hypot(d1, d2) + 0.001
    d_bp = 4.0 * (cfg.v2v_h_bs - 1.0) * (cfg.v2v_h_ms - 1.0) * fc * 1e9 / 3e8

    def pl_los(dist):
        near = 22.7 * jnp.log10(3.0) + 41.0 + 20.0 * jnp.log10(fc / 5.0)
        mid = 22.7 * jnp.log10(dist) + 41.0 + 20.0 * jnp.log10(fc / 5.0)
        far = (40.0 * jnp.log10(dist) + 9.45 - 17.3 * jnp.log10(cfg.v2v_h_bs)
               - 17.3 * jnp.log10(cfg.v2v_h_ms) + 2.7 * jnp.log10(fc / 5.0))
        return jnp.where(dist <= 3.0, near, jnp.where(dist < d_bp, mid, far))

    def pl_nlos(d_a, d_b):
        n_j = jnp.maximum(2.8 - 0.0024 * d_b, 1.84)
        # log10(d_b) with d_b == 0 would be -inf; NLOS is only selected when
        # min(d1,d2) >= 7 so both separations are positive there.
        safe_db = jnp.maximum(d_b, 1e-9)
        return (pl_los(d_a) + 20.0 - 12.5 * n_j + 10.0 * n_j * jnp.log10(safe_db)
                + 3.0 * jnp.log10(fc / 5.0))

    los = jnp.minimum(d1, d2) < 7.0
    pl = jnp.where(los, pl_los(d), jnp.minimum(pl_nlos(d1, d2), pl_nlos(d2, d1)))
    return pl


def v2i_pathloss(positions: jax.Array, cfg: EnvConfig) -> jax.Array:
    """V2I pathloss vector [N] in dB (reference Environment.py:140-146)."""
    bs = jnp.asarray(cfg.bs_position)
    d1 = jnp.abs(positions[:, 0] - bs[0])
    d2 = jnp.abs(positions[:, 1] - bs[1])
    dist = jnp.hypot(d1, d2)
    dh = cfg.v2i_h_bs - cfg.v2i_h_ms
    return 128.1 + 37.6 * jnp.log10(jnp.sqrt(dist ** 2 + dh ** 2) / 1000.0)


def ar1_shadow_update(shadow: jax.Array, delta_distance: jax.Array,
                      decorrelation: float, std: float,
                      key: jax.Array) -> jax.Array:
    """Spatially-correlated log-normal shadowing update.

    Gauss-Markov AR(1) process (reference Environment.py:70-83 for V2V where
    `delta_distance[i,j] = d_i + d_j`, and Environment.py:148-156 for V2I where
    it is the per-vehicle distance): shadow' = rho*shadow + sqrt(1-rho^2)*n,
    rho = exp(-delta/decorr), n ~ N(0, std).

    NOTE the reference passes sigma to `random.gauss(mu, sigma)` as the
    *standard deviation* (Python semantics), matching np.random.normal scale.
    """
    rho = jnp.exp(-delta_distance / decorrelation)
    noise = std * jax.random.normal(key, shadow.shape)
    return rho * shadow + jnp.sqrt(1.0 - rho ** 2) * noise


def rayleigh_fading_db(key: jax.Array, shape) -> jax.Array:
    """Per-RB Rayleigh fast fading in dB: 20*log10|h|, h ~ CN(0,1).

    Reference Environment.py:85-91 / 158-165 (two gaussian draws per entry).
    """
    k_re, k_im = jax.random.split(key)
    re = jax.random.normal(k_re, shape)
    im = jax.random.normal(k_im, shape)
    mag2 = 0.5 * (re ** 2 + im ** 2)
    return 10.0 * jnp.log10(jnp.maximum(mag2, 1e-30))
