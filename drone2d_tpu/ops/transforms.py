"""SO(2) frame math.

Capability parity with reference `drone_2d_custom_gym_env/transformations.py`:
`ssa` (:6), `R_w_b` (:9), `translate` (:13), `homogeneous_transform` (:18) —
re-expressed as jnp functions that broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def ssa(angle: jnp.ndarray) -> jnp.ndarray:
    """Smallest signed angle: wrap to (-pi, pi]-ish range [-pi, pi)."""
    return (angle + jnp.pi) % (2 * jnp.pi) - jnp.pi


def rot2d(theta: jnp.ndarray) -> jnp.ndarray:
    """2x2 rotation matrix R(theta); stacks over leading dims of theta.

    Matches the reference's `R_w_b(theta)` (transformations.py:9-11), which —
    despite the name — is the active rotation by +theta.  The observation
    builder composes it with an extra `- alpha` (drone_2d_env.py:752-761);
    we replicate that composition verbatim in the obs code.
    """
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def rotate(theta: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate 2-vector(s) v by theta (same math as rot2d @ v, fused)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    x, y = v[..., 0], v[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)


def translate(x, y):
    """3x3 homogeneous translation (transformations.py:13-16)."""
    one = jnp.ones_like(jnp.asarray(x, jnp.float32))
    zero = jnp.zeros_like(one)
    return jnp.stack(
        [
            jnp.stack([one, zero, jnp.asarray(x, jnp.float32)], axis=-1),
            jnp.stack([zero, one, jnp.asarray(y, jnp.float32)], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def homogeneous_transform(x, y, theta):
    """3x3 homogeneous rotation+translation (transformations.py:18-21)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    xa = jnp.broadcast_to(jnp.asarray(x, jnp.float32), c.shape) if hasattr(c, "shape") else x
    ya = jnp.broadcast_to(jnp.asarray(y, jnp.float32), c.shape) if hasattr(c, "shape") else y
    return jnp.stack(
        [
            jnp.stack([c, -s, xa], axis=-1),
            jnp.stack([s, c, ya], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def m1to1(value, lo, hi):
    """Normalize [lo, hi] -> [-1, 1] (drone_2d_env.py:972-974)."""
    return 2.0 * (value - lo) / (hi - lo) - 1.0


def invm1to1(value, lo, hi):
    """Inverse of m1to1 (drone_2d_env.py:976-978)."""
    return (value + 1.0) * (hi - lo) / 2.0 + lo
