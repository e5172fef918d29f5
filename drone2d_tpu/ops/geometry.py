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


# ---------------------------------------------------------------------------
# Box obstacles (reference obstacles.py:20-45 Square/Rectangle — dead in the
# reference's live path, ported for component parity, off by default).
# Every obstacle is modeled as a ROUNDED axis-aligned box: half-extents
# half_wh plus radius r.  half_wh == 0 degenerates to the circle formulas
# above bit-for-bit; r == 0 with half_wh > 0 is a sharp Square/Rectangle.
# ---------------------------------------------------------------------------


def point_aabb_sdf(points: jnp.ndarray, centers: jnp.ndarray,
                   half_wh: jnp.ndarray) -> jnp.ndarray:
    """Signed distance from each point to each axis-aligned box.

    points: (V, 2); centers: (K, 2); half_wh: (K, 2) -> (V, K).
    half_wh == 0 reduces to the point-to-center distance |p - c|.
    """
    rel = points[:, None, :] - centers[None, :, :]          # (V, K, 2)
    q = jnp.abs(rel) - half_wh[None, :, :]
    outside = jnp.sqrt(jnp.sum(jnp.maximum(q, 0.0) ** 2, axis=-1))
    inside = jnp.minimum(jnp.maximum(q[..., 0], q[..., 1]), 0.0)
    return outside + inside


def vertex_rounded_box_distances(
    verts: jnp.ndarray, centers: jnp.ndarray, half_wh: jnp.ndarray,
    radii: jnp.ndarray,
) -> jnp.ndarray:
    """Min over drone vertices of (aabb_sdf - r) per obstacle — the
    vertex-sampled observation metric (drone_2d_env.py:948-961) generalized
    to rounded boxes.  With half_wh == 0 it equals
    `vertex_circle_distances` exactly."""
    return jnp.min(point_aabb_sdf(verts, centers, half_wh) - radii[None, :], axis=0)


def any_collision_mixed(
    pos: jnp.ndarray,
    angle: jnp.ndarray,
    half_w: float,
    half_h: float,
    centers: jnp.ndarray,
    radii: jnp.ndarray,
    half_wh: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Collision test for a mixed circle/box obstacle field.

    Circle obstacles (half_wh == 0) keep the EXACT narrow phase of
    `any_collision` (true rotated-box SDF vs circle).  Box obstacles use a
    separating-axis test over the 4 candidate axes (2 world axes for the
    AABB, 2 body axes for the rotated frame) — exact for the sharp
    Square/Rectangle port (r == 0); a radius r expands the box extents,
    which is exact on face contacts and mildly conservative at corners.
    """
    is_box = jnp.any(half_wh > 0.0, axis=-1)                # (K,)

    circle_hit = box_circle_sdf(pos, angle, half_w, half_h, centers) < radii

    # SAT: axes as rows; drone body axes u, v from the rotation
    c, s = jnp.cos(angle), jnp.sin(angle)
    axes = jnp.stack(
        [
            jnp.stack([jnp.ones_like(c), jnp.zeros_like(c)]),  # world x
            jnp.stack([jnp.zeros_like(c), jnp.ones_like(c)]),  # world y
            jnp.stack([c, s]),                                 # drone u
            jnp.stack([-s, c]),                                # drone v
        ]
    )                                                        # (4, 2)
    delta = centers - pos[None, :]                           # (K, 2)
    proj_d = jnp.abs(delta @ axes.T)                         # (K, 4)
    # drone extent per axis: |u.a| half_w + |v.a| half_h
    ext_drone = (
        jnp.abs(axes @ jnp.stack([c, s])) * half_w
        + jnp.abs(axes @ jnp.stack([-s, c])) * half_h
    )                                                        # (4,)
    # AABB extent per axis: hw |a_x| + hh |a_y|  (+ r rounding margin)
    ext_box = (
        half_wh[:, 0:1] * jnp.abs(axes[None, :, 0])
        + half_wh[:, 1:2] * jnp.abs(axes[None, :, 1])
        + radii[:, None]
    )                                                        # (K, 4)
    box_hit = jnp.all(proj_d < ext_drone[None, :] + ext_box, axis=-1)

    hit = jnp.where(is_box, box_hit, circle_hit) & mask
    return jnp.any(hit)
