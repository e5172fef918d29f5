"""Native C++ core: build, bind, and cross-validate against both the float64
python oracle and the JAX device kernels (triple conformance)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drone2d_tpu.config import EnvConfig
from drone2d_tpu.ops import path as jpath, physics

native = pytest.importorskip("drone2d_tpu.native")
if not native.available():
    pytest.skip("no C++ toolchain", allow_module_level=True)

from drone2d_tpu.native import NativeBody, NativePath
from drone2d_tpu.utils.host_path import HostQPMI
from tests.oracle import OracleQPMI


def _wps():
    rng = np.random.default_rng(0)
    wps = [np.array([150.0, 140.0])]
    for _ in range(11):
        az = rng.uniform(0, np.pi / 2)
        wps.append(wps[-1] + 100 * np.array([np.cos(az), np.sin(az)]))
    return np.stack(wps)


def test_native_path_matches_python_oracle():
    wps = _wps()
    npath = NativePath(wps)
    oracle = OracleQPMI(wps)
    assert npath.length == pytest.approx(oracle.length, rel=1e-12)
    for u in np.linspace(-9.0, oracle.length + 9.0, 300):
        np.testing.assert_allclose(npath.point(u), oracle(u), atol=1e-9)
    for u in np.linspace(1.0, oracle.length - 1.0, 50):
        np.testing.assert_allclose(npath.gradient(u), oracle.gradient(u), atol=1e-9)
        assert npath.direction_angle(u) == pytest.approx(
            oracle.direction_angle(u), abs=1e-9
        )


def test_native_closest_matches_host_search():
    wps = _wps()
    npath = NativePath(wps)
    host = HostQPMI(wps)
    rng = np.random.default_rng(2)
    pts = rng.uniform(wps.min(0) - 100, wps.max(0) + 100, (30, 2))
    for p in pts:
        got = npath.closest_position(p)
        # dense native search must be at least as good as scipy fminbound
        oracle = OracleQPMI(wps)
        want = oracle.closest_position(p)
        assert np.linalg.norm(got - p) <= np.linalg.norm(want - p) + 1e-6


def test_native_body_matches_jax_step():
    cfg = EnvConfig()
    body = NativeBody(
        dt=cfg.physics_dt, gravity_y=cfg.gravity_y, mass=cfg.total_mass,
        inertia=cfg.moment_of_inertia, arm=cfg.drone_radius,
    )
    rng = np.random.default_rng(3)
    s = np.array([650.0, 650.0, 10.0, -5.0, 0.3, 0.1])
    jb = physics.BodyState(
        pos=jnp.asarray(s[:2], jnp.float32), vel=jnp.asarray(s[2:4], jnp.float32),
        angle=jnp.float32(s[4]), omega=jnp.float32(s[5]),
    )
    for _ in range(200):
        a = rng.uniform(-1, 1, 2)
        forces = (a / 2 + 0.5) * cfg.force_scale
        s = body.step(s, forces[0], forces[1])
        jb = physics.step_body(
            jb, jnp.float32(forces[0]), jnp.float32(forces[1]),
            dt=cfg.physics_dt, gravity_y=cfg.gravity_y, mass=cfg.total_mass,
            inertia=cfg.moment_of_inertia, arm=cfg.drone_radius,
        )
    np.testing.assert_allclose(np.asarray(jb.pos), s[:2], rtol=2e-4, atol=0.3)
    np.testing.assert_allclose(np.asarray(jb.vel), s[2:4], rtol=2e-4, atol=0.3)
    assert float(jb.angle) == pytest.approx(s[4], abs=1e-3)


def test_native_rollout_matches_stepwise():
    cfg = EnvConfig()
    body = NativeBody(
        dt=cfg.physics_dt, gravity_y=cfg.gravity_y, mass=cfg.total_mass,
        inertia=cfg.moment_of_inertia, arm=cfg.drone_radius,
    )
    rng = np.random.default_rng(4)
    forces = rng.uniform(0, 1000, (50, 2))
    s0 = np.array([100.0, 200.0, 0.0, 0.0, 0.0, 0.0])
    traj = body.rollout(s0, forces)
    s = s0.copy()
    for t in range(50):
        s = body.step(s, forces[t, 0], forces[t, 1])
    np.testing.assert_allclose(traj[-1], s, rtol=1e-12)


def test_native_vs_device_ballistic():
    """Force-free arc: native float64 vs JAX float32 vs closed form."""
    cfg = EnvConfig()
    body = NativeBody(
        dt=cfg.physics_dt, gravity_y=cfg.gravity_y, mass=cfg.total_mass,
        inertia=cfg.moment_of_inertia, arm=cfg.drone_radius,
    )
    s = np.array([0.0, 0.0, 30.0, 40.0, 0.0, 0.0])
    T = 60
    traj = body.rollout(s, np.zeros((T, 2)))
    dt, g = cfg.physics_dt, cfg.gravity_y
    # position-first symplectic Euler closed form after T steps
    t = T
    x = 30.0 * dt * t
    y = 40.0 * dt * t + g * dt * dt * (t * (t - 1) / 2)
    assert traj[-1, 0] == pytest.approx(x, rel=1e-12)
    assert traj[-1, 1] == pytest.approx(y, rel=1e-9)
