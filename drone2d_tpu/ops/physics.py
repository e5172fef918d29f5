"""Rigid-body physics: the drone as one analytic composite body.

Replaces pymunk/Chipmunk2D (reference drone_2d_env.py:182-196, 400-406 and
Drone.py).  The reference builds three boxes (frame 100x10 m=0.2; two 20x20
motors m=0.4 at +-40 along body-x) tied by six zero-error-bias pivot joints
(Drone.py:60-95) — a rigid assembly — and steps a Chipmunk space at 60 Hz.
Because the joints are rigid, the multibody collapses exactly to one rigid
body with:

    mass   M = 0.2 + 0.4 + 0.4 = 1.0
    moment I = I_frame + 2*(I_motor + m_motor * r^2)          (r = 40)
             = 0.2*(100^2+10^2)/12 + 2*(0.4*(20^2+20^2)/12 + 0.4*1600)
             = 1501.666...

Chipmunk's cpSpaceStep order is position-first symplectic Euler:
    x'     = x + v  * dt          (uses the PREVIOUS velocity)
    theta' = theta + omega * dt
    <collision detection at x'>
    v'     = v + (g + F/M) * dt   (space damping defaults to 1.0: the
    omega' = omega + tau/I * dt    per-body `.damping` set at
                                   drone_2d_env.py:376-380 is a silent no-op)

Thrust (drone_2d_env.py:400-404): apply_force_at_local_point converts the
body-frame force (0, F) to world frame with the CURRENT angle theta (the one at
force-application time, i.e. before the position update), at local points
(-+drone_radius, 0):
    F_world = R(theta) . (0, F_left + F_right)
    tau     = drone_radius * (F_right - F_left)
Gravity (0, -1000) acts on every body; for the composite it is (0, -1000*M)
with zero torque about the COM.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class BodyState(NamedTuple):
    pos: jnp.ndarray    # (2,)
    vel: jnp.ndarray    # (2,)
    angle: jnp.ndarray  # ()
    omega: jnp.ndarray  # ()


def thrust_forces(action: jnp.ndarray, force_scale: float) -> jnp.ndarray:
    """Map action in [-1, 1]^2 to rotor forces (drone_2d_env.py:400-401):
    F_i = (a_i/2 + 0.5) * force_scale."""
    return (action / 2.0 + 0.5) * force_scale


def step_body(
    body: BodyState,
    left_force: jnp.ndarray,
    right_force: jnp.ndarray,
    *,
    dt: float,
    gravity_y: float,
    mass: float,
    inertia: float,
    arm: float,
) -> BodyState:
    """One Chipmunk-order integration step of the composite drone body."""
    # world thrust, computed with the pre-step angle (apply-time semantics)
    total_thrust = left_force + right_force
    c, s = jnp.cos(body.angle), jnp.sin(body.angle)
    f_world = jnp.stack([-s * total_thrust, c * total_thrust])  # R(theta) @ (0, F)
    torque = arm * (right_force - left_force)

    # position update with previous velocity (Chipmunk position-first order)
    pos = body.pos + body.vel * dt
    angle = body.angle + body.omega * dt

    # velocity update with gravity + applied forces
    g = jnp.array([0.0, gravity_y], dtype=body.vel.dtype)
    vel = body.vel + (g + f_world / mass) * dt
    omega = body.omega + (torque / inertia) * dt

    return BodyState(pos=pos, vel=vel, angle=angle, omega=omega)


def free_step_body(
    body: BodyState, *, dt: float, gravity_y: float
) -> BodyState:
    """A force-free settle step (used by the optional initial_movement,
    drone_2d_env.py:937-943)."""
    pos = body.pos + body.vel * dt
    angle = body.angle + body.omega * dt
    g = jnp.array([0.0, gravity_y], dtype=body.vel.dtype)
    vel = body.vel + g * dt
    return BodyState(pos=pos, vel=vel, angle=angle, omega=body.omega)
