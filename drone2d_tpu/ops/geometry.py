"""Batched 2D geometry: drone-obstacle distances and collision tests.

Replaces the reference's per-obstacle Python loops:

* `frame_vertex_circle_distance` <- Drone2dEnv.distance_between_shapes
  (drone_2d_env.py:948-961): min over the frame box's 4 world vertices of
  (|vertex - center| - radius).  This vertex-sampled metric — not the true
  box SDF — is what feeds the observation and obstacle ranking
  (drone_2d_env.py:617-629), so it is reproduced exactly.
* `frame_circle_collision` <- the Chipmunk narrow-phase that fires the (1,2)
  begin handler (drone_2d_env.py:190-191).  Only the frame poly carries
  collision_type=1 (Drone.py:27; the motor boxes default to 0 and have no
  handler), so a collision is: frame box (true SDF) overlapping any obstacle
  circle.
"""

from __future__ import annotations

import jax.numpy as jnp

from drone2d_tpu.ops.transforms import rotate


def frame_vertices(pos: jnp.ndarray, angle: jnp.ndarray, half_w: float, half_h: float) -> jnp.ndarray:
    """World positions of the frame box's 4 corners, shape (4, 2).

    The frame shape is pymunk Poly.create_box(size=(width, height/2))
    (Drone.py:16), so its local corners are (+-width/2, +-height/4).
    """
    corners = jnp.array(
        [
            [-half_w, -half_h],
            [-half_w, half_h],
            [half_w, half_h],
            [half_w, -half_h],
        ],
        dtype=pos.dtype,
    )
    return pos[None, :] + rotate(angle, corners)


def vertex_circle_distances(
    verts: jnp.ndarray, centers: jnp.ndarray, radii: jnp.ndarray
) -> jnp.ndarray:
    """Min over vertices of (|v - c| - r) for every circle.

    verts: (V, 2); centers: (K, 2); radii: (K,).  Returns (K,) distances —
    the reference's distance_between_shapes value per obstacle
    (drone_2d_env.py:953-961).
    """
    d = verts[:, None, :] - centers[None, :, :]           # (V, K, 2)
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1))              # (V, K)
    return jnp.min(dist - radii[None, :], axis=0)         # (K,)


def box_circle_sdf(
    pos: jnp.ndarray,
    angle: jnp.ndarray,
    half_w: float,
    half_h: float,
    centers: jnp.ndarray,
) -> jnp.ndarray:
    """Signed distance from the (rotated) box surface to each circle center.

    centers: (K, 2) -> (K,).  Negative inside the box.  Used for the physical
    collision test (frame poly vs obstacle circle), matching Chipmunk's
    poly-circle narrow phase: contact iff sdf < radius.
    """
    rel = centers - pos[None, :]
    local = rotate(-angle, rel)                            # world -> body
    q = jnp.abs(local) - jnp.array([half_w, half_h], dtype=pos.dtype)
    outside = jnp.sqrt(jnp.sum(jnp.maximum(q, 0.0) ** 2, axis=-1))
    inside = jnp.minimum(jnp.maximum(q[:, 0], q[:, 1]), 0.0)
    return outside + inside


def any_collision(
    pos: jnp.ndarray,
    angle: jnp.ndarray,
    half_w: float,
    half_h: float,
    centers: jnp.ndarray,
    radii: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """True iff the frame box overlaps any live obstacle circle."""
    sdf = box_circle_sdf(pos, angle, half_w, half_h, centers)
    hit = (sdf < radii) & mask
    return jnp.any(hit)
