"""Unit tests: composite-body integrator vs closed form + float64 oracle;
geometry distance semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from drone2d_tpu.config import EnvConfig
from drone2d_tpu.ops import geometry, physics
from tests.oracle import oracle_body_step

CFG = EnvConfig()


def test_composite_constants():
    assert CFG.drone_radius == 40.0
    assert CFG.total_mass == pytest.approx(1.0)
    # I = 0.2*(100^2+10^2)/12 + 2*(0.4*800/12 + 0.4*40^2)
    assert CFG.moment_of_inertia == pytest.approx(168.3333333 + 2 * (26.6666667 + 640.0), rel=1e-9)


import jax


@jax.jit
def _step(body, fl, fr):
    return physics.step_body(
        body,
        jnp.asarray(fl, jnp.float32),
        jnp.asarray(fr, jnp.float32),
        dt=CFG.physics_dt,
        gravity_y=CFG.gravity_y,
        mass=CFG.total_mass,
        inertia=CFG.moment_of_inertia,
        arm=CFG.drone_radius,
    )


def test_ballistic_arc_closed_form():
    """Zero thrust -> position-first Euler ballistic arc."""
    body = physics.BodyState(
        pos=jnp.array([100.0, 500.0]),
        vel=jnp.array([30.0, 40.0]),
        angle=jnp.float32(0.1),
        omega=jnp.float32(0.0),
    )
    n, dt, g = 120, CFG.physics_dt, CFG.gravity_y
    b = body
    for _ in range(n):
        b = _step(b, 0.0, 0.0)
    # x_{k+1} = x_k + v_k dt ; v_{k+1} = v_k + g dt  (discrete sums)
    x = 100.0 + sum((30.0) * dt for _ in range(n))
    y = 500.0 + sum((40.0 + g * dt * k) * dt for k in range(n))
    assert float(b.pos[0]) == pytest.approx(x, rel=1e-5)
    assert float(b.pos[1]) == pytest.approx(y, rel=1e-4)
    assert float(b.vel[1]) == pytest.approx(40.0 + g * dt * n, rel=1e-5)
    assert float(b.angle) == pytest.approx(0.1)


def test_hover_equilibrium():
    """F_l = F_r = mg/2 -> stationary hover (thrust applied along body +y)."""
    body = physics.BodyState(
        pos=jnp.array([650.0, 650.0]),
        vel=jnp.zeros(2),
        angle=jnp.float32(0.0),
        omega=jnp.float32(0.0),
    )
    hover = CFG.total_mass * (-CFG.gravity_y) / 2.0  # 500 each
    b = body
    for _ in range(200):
        b = _step(b, hover, hover)
    np.testing.assert_allclose(np.asarray(b.pos), [650.0, 650.0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(b.vel), [0.0, 0.0], atol=1e-3)


def test_differential_thrust_torque_sign():
    """F_right > F_left must rotate counter-clockwise (positive omega)."""
    body = physics.BodyState(
        pos=jnp.zeros(2), vel=jnp.zeros(2), angle=jnp.float32(0.0), omega=jnp.float32(0.0)
    )
    b = _step(body, 100.0, 300.0)
    assert float(b.omega) > 0
    expected = CFG.drone_radius * 200.0 / CFG.moment_of_inertia * CFG.physics_dt
    assert float(b.omega) == pytest.approx(expected, rel=1e-5)


def test_trajectory_matches_float64_oracle():
    rng = np.random.default_rng(7)
    pos = np.array([300.0, 900.0])
    vel = np.array([10.0, -5.0])
    angle, omega = 0.3, -0.2
    b = physics.BodyState(
        pos=jnp.asarray(pos, jnp.float32),
        vel=jnp.asarray(vel, jnp.float32),
        angle=jnp.float32(angle),
        omega=jnp.float32(omega),
    )
    for _ in range(300):
        a = rng.uniform(-1, 1, 2)
        fl, fr = (a / 2 + 0.5) * 1000.0
        b = _step(b, fl, fr)
        pos, vel, angle, omega = oracle_body_step(
            pos, vel, angle, omega, fl, fr,
            dt=CFG.physics_dt, g=CFG.gravity_y, mass=CFG.total_mass,
            inertia=CFG.moment_of_inertia, arm=CFG.drone_radius,
        )
    np.testing.assert_allclose(np.asarray(b.pos), pos, atol=0.5)
    np.testing.assert_allclose(np.asarray(b.vel), vel, atol=0.05)
    assert float(b.angle) == pytest.approx(angle, abs=1e-3)
    assert float(b.omega) == pytest.approx(omega, abs=1e-4)


# --- geometry -------------------------------------------------------------

HALF_W, HALF_H = 50.0, 5.0  # frame box 100 x 10 -> half extents


def test_vertex_circle_distance_axis_aligned():
    verts = geometry.frame_vertices(jnp.array([0.0, 0.0]), jnp.float32(0.0), HALF_W, HALF_H)
    np.testing.assert_allclose(
        np.sort(np.asarray(verts), axis=0),
        np.sort(np.array([[-50, -5], [-50, 5], [50, 5], [50, -5]]), axis=0),
        atol=1e-5,
    )
    centers = jnp.array([[100.0, 0.0], [0.0, 100.0]])
    radii = jnp.array([10.0, 10.0])
    d = geometry.vertex_circle_distances(verts, centers, radii)
    # nearest vertex to (100,0) is (50,+-5): sqrt(50^2+25)-10
    assert float(d[0]) == pytest.approx(np.hypot(50, 5) - 10, rel=1e-5)
    # nearest vertex to (0,100) is (+-50,5): sqrt(2500+95^2)-10
    assert float(d[1]) == pytest.approx(np.hypot(50, 95) - 10, rel=1e-5)


def test_vertex_distance_brute_force_random():
    rng = np.random.default_rng(3)
    for _ in range(25):
        pos = rng.uniform(0, 1300, 2)
        ang = rng.uniform(-np.pi, np.pi)
        centers = rng.uniform(0, 1300, (8, 2))
        radii = rng.uniform(10, 50, 8)
        verts = geometry.frame_vertices(jnp.asarray(pos, jnp.float32), jnp.float32(ang), HALF_W, HALF_H)
        got = np.asarray(
            geometry.vertex_circle_distances(
                verts, jnp.asarray(centers, jnp.float32), jnp.asarray(radii, jnp.float32)
            )
        )
        # float64 brute force of the reference semantics
        R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
        corners = np.array([[-50, -5], [-50, 5], [50, 5], [50, -5]], float)
        world = pos + corners @ R.T
        want = np.min(
            np.linalg.norm(world[:, None, :] - centers[None], axis=-1) - radii[None],
            axis=0,
        )
        np.testing.assert_allclose(got, want, atol=1e-2)


def test_collision_sdf():
    pos = jnp.array([0.0, 0.0])
    # circle just touching the right edge of the unrotated box
    centers = jnp.array([[60.0, 0.0], [0.0, 50.0], [500.0, 0.0]])
    radii = jnp.array([10.5, 44.0, 10.0])
    mask = jnp.array([True, True, True])
    assert bool(
        geometry.any_collision(pos, jnp.float32(0.0), HALF_W, HALF_H, centers, radii, mask)
    )
    radii2 = jnp.array([9.5, 44.0, 10.0])
    assert not bool(
        geometry.any_collision(pos, jnp.float32(0.0), HALF_W, HALF_H, centers, radii2, mask)
    )
    # mask hides an overlapping obstacle
    radii3 = jnp.array([10.5, 44.0, 10.0])
    mask2 = jnp.array([False, True, True])
    assert not bool(
        geometry.any_collision(pos, jnp.float32(0.0), HALF_W, HALF_H, centers, radii3, mask2)
    )


# ---------------------------------------------------------------------------
# Box obstacles (reference obstacles.py:20-45 Square/Rectangle port)
# ---------------------------------------------------------------------------


def test_point_aabb_sdf_known_values():
    from drone2d_tpu.ops.geometry import point_aabb_sdf

    pts = jnp.array([[5.0, 0.0], [0.0, 0.0], [3.0, 4.0]])
    centers = jnp.array([[0.0, 0.0]])
    half = jnp.array([[2.0, 1.0]])
    d = np.asarray(point_aabb_sdf(pts, centers, half))[:, 0]
    assert d[0] == pytest.approx(3.0)          # right face at x=2
    assert d[1] == pytest.approx(-1.0)         # inside: nearest face 1 away
    assert d[2] == pytest.approx(np.hypot(1.0, 3.0))  # corner (2,1)


def test_rounded_box_degenerates_to_circle():
    """half_wh == 0 must reproduce vertex_circle_distances bit-for-bit, so
    the circles-only path and the mixed path agree."""
    from drone2d_tpu.ops.geometry import (
        frame_vertices, vertex_circle_distances, vertex_rounded_box_distances,
    )

    key = jax.random.PRNGKey(0)
    verts = frame_vertices(jnp.array([600.0, 700.0]), jnp.float32(0.3), 50.0, 5.0)
    centers = jax.random.uniform(key, (12, 2), minval=0.0, maxval=1300.0)
    radii = jax.random.uniform(jax.random.PRNGKey(1), (12,), minval=5.0, maxval=60.0)
    a = vertex_circle_distances(verts, centers, radii)
    b = vertex_rounded_box_distances(verts, centers, jnp.zeros((12, 2)), radii)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_any_collision_mixed_matches_circle_path():
    from drone2d_tpu.ops.geometry import any_collision, any_collision_mixed

    key = jax.random.PRNGKey(2)
    centers = jax.random.uniform(key, (8, 2), minval=0.0, maxval=400.0)
    radii = jnp.full((8,), 30.0)
    mask = jnp.ones((8,), bool)
    zero_half = jnp.zeros((8, 2))
    for px in (0.0, 100.0, 200.0, 300.0):
        pos = jnp.array([px, 200.0])
        a = bool(any_collision(pos, jnp.float32(0.4), 50.0, 5.0, centers, radii, mask))
        b = bool(any_collision_mixed(pos, jnp.float32(0.4), 50.0, 5.0,
                                     centers, radii, zero_half, mask))
        assert a == b


def test_box_collision_hits_and_misses():
    """Drone frame (half 50x5) vs a Square of side 60 at (200, 200) — the
    box spans [170, 230]^2.  Expectations computed from the exact box-box
    overlap; the two-way vertex sampling must match them here because every
    contact below is corner-led."""
    from drone2d_tpu.ops.geometry import any_collision_mixed

    centers = jnp.array([[200.0, 200.0]])
    half = jnp.array([[30.0, 30.0]])
    r = jnp.zeros((1,))
    mask = jnp.ones((1,), bool)

    def hit(x, y, angle=0.0):
        return bool(any_collision_mixed(
            jnp.array([x, y]), jnp.float32(angle), 50.0, 5.0,
            centers, r, half, mask,
        ))

    assert hit(200.0, 200.0)       # drone centered inside the box
    assert hit(200.0, 232.0)       # frame bottom 227 under box top 230
    assert not hit(200.0, 300.0)   # frame bottom 295, box top 230: clear
    assert not hit(400.0, 200.0)   # frame left 350, box right 230: clear
    assert hit(275.0, 200.0)       # frame spans x [225, 325]: 5 px overlap
    assert not hit(283.0, 200.0)   # frame spans x [233, 333]: 3 px gap
    # rotated 90 deg the 100-px span lies along y: y in [yc-50, yc+50]
    assert hit(200.0, 278.0, angle=np.pi / 2)       # y [228, 328]: overlap
    assert not hit(200.0, 282.0, angle=np.pi / 2)   # y [232, 332]: 2 px gap
