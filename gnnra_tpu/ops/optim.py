"""Optimizers matching the reference's Keras semantics.

The reference compiles with `keras.optimizers.Adam(lr=0.001, beta_1=0.5,
beta_2=0.999)` (BS_brain.py:212-214). Keras Adam (identical update rule in
2.2.4 and 3.x) differs from `optax.adam` in epsilon placement:

    keras:  alpha = lr * sqrt(1 - b2^t) / (1 - b1^t)
            p    -= alpha * m / (sqrt(v) + eps)          # eps on RAW sqrt(v)
    optax:  p    -= lr * m_hat / (sqrt(v_hat) + eps)     # eps on CORRECTED

i.e. keras's effective epsilon is eps/sqrt(1-b2^t) — time-varying. With the
keras default eps=1e-7 the difference is tiny but nonzero; `keras_adam`
reproduces the keras rule exactly so one full replay-update step is
bit-comparable against the golden bundle (tests/golden/golden_model.npz).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class KerasAdamState(NamedTuple):
    count: jax.Array   # [] int32
    m: optax.Updates
    v: optax.Updates


def keras_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-7) -> optax.GradientTransformation:
    """Keras-semantics Adam (see module docstring)."""

    def init_fn(params):
        zeros = lambda t: jax.tree.map(jnp.zeros_like, t)
        return KerasAdamState(count=jnp.zeros((), jnp.int32),
                              m=zeros(params), v=zeros(params))

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        m = jax.tree.map(lambda mu, g: b1 * mu + (1.0 - b1) * g,
                         state.m, updates)
        v = jax.tree.map(lambda nu, g: b2 * nu + (1.0 - b2) * (g * g),
                         state.v, updates)
        alpha = learning_rate * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        new_updates = jax.tree.map(
            lambda mu, nu: -alpha * mu / (jnp.sqrt(nu) + eps), m, v)
        return new_updates, KerasAdamState(count=count, m=m, v=v)

    return optax.GradientTransformation(init_fn, update_fn)
