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
