"""Golden-trajectory conformance: the JAX device code vs COMMITTED float64
fixtures (tests/fixtures/*.npz, generated once by tests/make_fixtures.py from
the C++ engine + scipy/numpy oracles).

These lock the physics integration order, the QPMI2D path math, and the
reward equations against regressions without needing the native toolchain or
scipy at test time (SURVEY.md §4 conformance layer, VERDICT r1 next #5).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drone2d_tpu.config import EnvConfig

FIX = os.path.join(os.path.dirname(__file__), "fixtures")
CFG = EnvConfig()


def _load(name):
    path = os.path.join(FIX, name)
    assert os.path.exists(path), f"committed fixture missing: {path}"
    return np.load(path)


@pytest.mark.parametrize("script", ["hover", "spin", "random"])
def test_physics_matches_golden_trajectory(script):
    """300 float32 steps of ops/physics.step_body vs the float64 C++ engine
    (Chipmunk position-first order).  Per-step error is float32 rounding;
    the bound covers its worst-case compounding over the horizon."""
    from drone2d_tpu.ops import physics

    z = _load("golden_physics.npz")
    actions = jnp.asarray(z[f"actions_{script}"], jnp.float32)
    golden = z[f"traj_{script}"]
    init = z["init_state"]

    body = physics.BodyState(
        pos=jnp.asarray(init[:2], jnp.float32),
        vel=jnp.asarray(init[2:4], jnp.float32),
        angle=jnp.float32(init[4]),
        omega=jnp.float32(init[5]),
    )

    def step(b, a):
        f = physics.thrust_forces(a, CFG.force_scale)
        b = physics.step_body(
            b, f[0], f[1], dt=CFG.physics_dt, gravity_y=CFG.gravity_y,
            mass=CFG.total_mass, inertia=CFG.moment_of_inertia,
            arm=CFG.drone_radius,
        )
        return b, jnp.concatenate(
            [b.pos, b.vel, b.angle[None], b.omega[None]]
        )

    _, traj = jax.jit(lambda b: jax.lax.scan(step, b, actions))(body)
    traj = np.asarray(traj, np.float64)

    # positions reach O(1e4) px and velocities O(1e3); float32 eps compounds
    # roughly linearly in T over 300 steps
    scale = np.maximum(np.abs(golden), 1.0)
    rel = np.abs(traj - golden) / scale
    assert rel.max() < 2e-3, (script, rel.max())
    # the first 30 steps are near-exact
    assert np.abs(traj[:30] - golden[:30]).max() < 0.05, script


def test_path_matches_golden():
    from drone2d_tpu.ops import path as jpath

    z = _load("golden_path.npz")
    pd = jpath.make_path(
        jnp.asarray(z["wps"], jnp.float32), jnp.int32(len(z["wps"])),
        table_n=512,
    )
    assert float(pd.length) == pytest.approx(float(z["length"]), rel=1e-5)

    us = jnp.asarray(z["us"], jnp.float32)
    pts = np.asarray(jax.vmap(lambda u: jpath.path_point(pd, u))(us))
    np.testing.assert_allclose(pts, z["points"], atol=2e-2)

    grads = np.asarray(jax.vmap(lambda u: jpath.path_gradient(pd, u))(us))
    np.testing.assert_allclose(grads, z["gradients"], atol=5e-3)

    angles = np.asarray(jax.vmap(lambda u: jpath.direction_angle(pd, u))(us))
    # direction angles wrap at +-pi; compare on the circle
    d = np.abs((angles - z["angles"] + np.pi) % (2 * np.pi) - np.pi)
    assert d.max() < 5e-3

    la = np.asarray(
        jax.vmap(lambda u: jpath.lookahead_point_from_u(pd, u, CFG.lookahead))(us)
    )
    np.testing.assert_allclose(la, z["lookahead"], atol=3e-2)


def test_closest_point_never_worse_than_golden():
    """Our table+refine closest-point search must never return a point
    farther from the query than the float64 golden-section search (it may be
    CLOSER — the global table beats fminbound's local minima on S-paths)."""
    from drone2d_tpu.ops import path as jpath

    z = _load("golden_path.npz")
    pd = jpath.make_path(
        jnp.asarray(z["wps"], jnp.float32), jnp.int32(len(z["wps"])),
        table_n=512,
    )

    def ours(q):
        u = jpath.closest_u(pd, q, golden_iters=0, fine_points=17)
        return jpath.path_point(pd, u)

    cps = np.asarray(jax.vmap(ours)(jnp.asarray(z["queries"], jnp.float32)))
    golden_cp = np.stack(
        [
            np.asarray(
                jax.vmap(lambda u: jpath.path_point(pd, u))(
                    jnp.asarray(z["closest_native"], jnp.float32)
                )
            )
        ]
    )[0]
    q = z["queries"]
    d_ours = np.hypot(*(cps - q).T)
    d_gold = np.hypot(*(golden_cp - q).T)
    assert np.all(d_ours <= d_gold + 1.0), (d_ours - d_gold).max()


def test_reward_matches_golden():
    """Reward + done vs the float64 oracle on 200 random observation
    round-trips (the fixture freezes drone_2d_env.py:422-572 semantics)."""
    from drone2d_tpu.env.env import _rewards_and_done

    z = _load("golden_reward.npz")
    obs = jnp.asarray(z["obs"], jnp.float32)
    has = jnp.asarray(z["has_obs"])
    coll = jnp.asarray(z["collided"])
    t_new = jnp.asarray(z["t_new"], jnp.int32)

    def one(o, h, c, t):
        r = _rewards_and_done(CFG, o, h, c, t)
        return r["reward"], r["done"]

    rewards, dones = jax.jit(jax.vmap(one))(obs, has, coll, t_new)
    np.testing.assert_allclose(
        np.asarray(rewards), z["rewards"], atol=2e-3, rtol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(dones), z["dones"])
