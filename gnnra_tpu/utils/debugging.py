"""Numerical-safety and invariant checks (the TPU-native stand-in for the
race detectors / sanitizers the reference lacks — SURVEY.md §5: jax debug
checks + deterministic collectives; single-program SPMD has no data races
to detect, so validation focuses on NaNs and state invariants)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gnnra_tpu.config import EnvConfig
from gnnra_tpu.env.vehicular import EnvState


def enable_nan_checks(enable: bool = True) -> None:
    """Raise on any NaN produced under jit (debug runs only — disables
    some fusion)."""
    jax.config.update("jax_debug_nans", enable)


def enable_highest_matmul_precision(enable: bool = True) -> None:
    """Force highest-precision matmul accumulation (no bf16 fast paths).

    This improves run-to-run numeric stability of matmul-heavy programs but
    does NOT make XLA reductions/collectives bitwise-deterministic — XLA on
    TPU compiles a fixed reduction tree per program shape, so determinism
    within one compiled program already holds; there is no global
    "deterministic reductions" switch to flip."""
    jax.config.update("jax_default_matmul_precision",
                      "highest" if enable else None)


def validate_env_state(state: EnvState, cfg: EnvConfig) -> None:
    """Host-side invariant check on an environment state (debug/test use)."""
    n, m, r = cfg.n_veh, cfg.n_neighbor, cfg.n_rb
    assert state.positions.shape == (n, 2)
    assert state.destinations.shape == (n, m)
    assert state.v2v_fast.shape == (n, n, r)
    dest = jax.device_get(state.destinations)
    assert ((dest >= 0) & (dest < n)).all(), "destination out of range"
    assert (dest[:, 0] != jnp.arange(n)).all(), "self-loop destination"
    pos = jax.device_get(state.positions)
    assert jnp.isfinite(pos).all(), "non-finite positions"
    for name in ("v2v_abs", "v2i_abs", "v2v_fast", "v2i_fast",
                 "shadow_v2v", "shadow_v2i"):
        arr = jax.device_get(getattr(state, name))
        assert jnp.isfinite(arr).all(), f"non-finite {name}"


def tree_all_finite(tree) -> bool:
    """True iff every leaf of a pytree is finite (params/grads health)."""
    leaves = jax.tree.leaves(tree)
    return bool(jnp.all(jnp.stack(
        [jnp.all(jnp.isfinite(l)) for l in leaves
         if jnp.issubdtype(l.dtype, jnp.floating)])))
