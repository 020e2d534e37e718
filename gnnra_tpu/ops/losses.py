"""Loss functions matching the reference's TF1 semantics.

`tf.losses.huber_loss` (reference BS_brain.py:86-87, compiled at 214) uses
delta=1.0 and reduction SUM_BY_NONZERO_WEIGHTS, which with unit weights is the
mean over all elements; Keras then sums the per-output (per-Q-head) losses.
"""

from __future__ import annotations

import jax.numpy as jnp


def huber(y_true, y_pred, delta: float = 1.0):
    """Elementwise Huber: 0.5*e^2 for |e|<=delta else delta*(|e|-0.5*delta)."""
    err = jnp.abs(y_true - y_pred)
    quad = jnp.minimum(err, delta)
    lin = err - quad
    return 0.5 * quad ** 2 + delta * lin


def huber_mean(y_true, y_pred, delta: float = 1.0):
    """tf.losses.huber_loss equivalent: mean over all elements."""
    return jnp.mean(huber(y_true, y_pred, delta))


def dqn_loss(q_pred, q_target, delta: float = 1.0):
    """Total training loss: sum over heads of per-head mean Huber.

    q_pred/q_target: [B, N, A]. Keras sums the four named-output losses
    (reference BS_brain.py:203-214), each a mean over (batch, actions).
    """
    per_head = jnp.mean(huber(q_target, q_pred, delta), axis=(0, 2))  # [N]
    return jnp.sum(per_head)
