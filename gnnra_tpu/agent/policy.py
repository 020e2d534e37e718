"""Action-selection policies (epsilon-greedy / random / greedy).

Re-designs `Agent.select_action_while_training` / `select_action_random`
(reference BS_brain.py:308-364) as pure jittable functions: the anneal is the
same linear MAX->MIN schedule over the first 80% of total env steps
(BS_brain.py:315-324); the exploration branch is a single `jnp.where` instead
of host-side control flow, so rollouts stay on device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from gnnra_tpu.config import TrainConfig


def epsilon_at(step: jax.Array, total_steps: int, cfg: TrainConfig) -> jax.Array:
    """Linear anneal from max_epsilon to min_epsilon over
    epsilon_anneal_fraction of total env steps (reference BS_brain.py:315-324)."""
    anneal_steps = total_steps * cfg.epsilon_anneal_fraction
    frac = (cfg.max_epsilon - cfg.min_epsilon) / anneal_steps
    eps = cfg.max_epsilon - frac * step
    return jnp.where(step < anneal_steps, eps, cfg.min_epsilon)


def random_actions(key: jax.Array, n_nodes: int, n_actions: int) -> jax.Array:
    """Uniform per-node channel choice (reference BS_brain.py:354-364)."""
    return jax.random.randint(key, (n_nodes,), 0, n_actions)


def greedy_actions(q_values: jax.Array) -> jax.Array:
    """Argmax per node head; q_values [N, A] (reference BS_brain.py:340-350;
    ties resolve to the first max, same as np.where(...)[0][0])."""
    return jnp.argmax(q_values, axis=-1).astype(jnp.int32)


def epsilon_greedy(key: jax.Array, q_values: jax.Array, epsilon: jax.Array
                   ) -> Tuple[jax.Array, jax.Array]:
    """One joint epsilon-greedy decision: with prob epsilon *all* nodes act
    randomly, otherwise all act greedily — the reference draws a single
    uniform for the whole joint action (BS_brain.py:330), not per node.

    Returns (actions [N], explored flag).
    """
    n, a = q_values.shape
    k_bern, k_rand = jax.random.split(key)
    explore = jax.random.uniform(k_bern) < epsilon
    rand = random_actions(k_rand, n, a)
    greedy = greedy_actions(q_values)
    return jnp.where(explore, rand, greedy), explore
