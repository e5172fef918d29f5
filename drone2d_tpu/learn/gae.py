"""Generalized advantage estimation as a reverse `lax.scan`.

The reference inherits GAE from SB3 (`buffers.py compute_returns_and_advantage`,
consumed via `main.py:200,208`); semantics here are identical: at an env
auto-reset boundary (done=True) the bootstrap value is dropped, and
returns = advantages + values (SB3's TD(lambda) return convention).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def compute_gae(
    rewards: jnp.ndarray,      # (T, N)
    values: jnp.ndarray,       # (T, N) V(s_t) under the rollout policy
    dones: jnp.ndarray,        # (T, N) episode ended AT step t (after acting)
    last_values: jnp.ndarray,  # (N,)   V(s_{T}) bootstrap
    *,
    gamma: float,
    gae_lambda: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (advantages, returns), both (T, N)."""
    not_done = 1.0 - dones.astype(values.dtype)

    def backward(carry, xs):
        gae, next_value = carry
        reward, value, nd = xs
        delta = reward + gamma * next_value * nd - value
        gae = delta + gamma * gae_lambda * nd * gae
        return (gae, value), gae

    (_, _), adv_rev = jax.lax.scan(
        backward,
        (jnp.zeros_like(last_values), last_values),
        (rewards[::-1], values[::-1], not_done[::-1]),
    )
    advantages = adv_rev[::-1]
    return advantages, advantages + values
