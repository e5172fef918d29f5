"""Generate the committed golden conformance fixtures (tests/fixtures/*.npz).

Run from the repo root when the physics/path/reward SEMANTICS intentionally
change (they mirror the frozen reference, so that should be ~never):

    python tests/make_fixtures.py

Sources of truth:
* physics  — the float64 C++ engine (native/drone2d_core.cpp, Chipmunk's
  documented position-first symplectic Euler order);
* path     — the float64 C++ QPMI2D + the scipy fminbound oracle
  (tests/oracle.py) for closest-point parity points;
* reward   — the float64 numpy oracle (tests/oracle.py:oracle_reward),
  an independent implementation of drone_2d_env.py:457-572.

The fixtures freeze those oracles' outputs so `tests/test_golden.py` can
detect regressions without rebuilding the C++ library — and so conformance
survives toolchain drift (SURVEY.md §4, VERDICT r1 next #5).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from drone2d_tpu.config import EnvConfig
from drone2d_tpu.native import NativeBody, NativePath
from tests.oracle import OracleQPMI, oracle_reward

OUT = os.path.join(os.path.dirname(__file__), "fixtures")

CFG = EnvConfig()
T = 300

# three fixed action scripts: hover, spin, seeded pseudo-random
RNG = np.random.default_rng(20260817)
ACTION_SCRIPTS = {
    "hover": np.zeros((T, 2)),
    "spin": np.tile(np.array([1.0, -1.0]), (T, 1)),
    "random": RNG.uniform(-1.0, 1.0, (T, 2)),
}
INIT_STATE = np.array([650.0, 900.0, 40.0, -25.0, 0.35, -0.4])  # x y vx vy a w

WPS = np.array(
    [
        [180.0, 220.0],
        [280.0, 260.0],
        [330.0, 360.0],
        [430.0, 420.0],
        [540.0, 400.0],
        [640.0, 470.0],
        [700.0, 570.0],
    ]
)


def physics_fixture() -> dict:
    body = NativeBody(
        dt=CFG.physics_dt, gravity_y=CFG.gravity_y, mass=CFG.total_mass,
        inertia=CFG.moment_of_inertia, arm=CFG.drone_radius,
    )
    out = {"init_state": INIT_STATE}
    for name, actions in ACTION_SCRIPTS.items():
        forces = (actions / 2.0 + 0.5) * CFG.force_scale
        out[f"actions_{name}"] = actions
        out[f"traj_{name}"] = body.rollout(INIT_STATE, forces)
    return out


def path_fixture() -> dict:
    native = NativePath(WPS)
    oracle = OracleQPMI(WPS)
    L = native.length
    us = np.linspace(0.0, L, 64)
    pts = np.stack([native.point(u) for u in us])
    grads = np.stack([native.gradient(u) for u in us])
    angles = np.array([native.direction_angle(u) for u in us])
    queries = np.stack(
        [RNG.uniform(100.0, 800.0, 32), RNG.uniform(100.0, 700.0, 32)], axis=-1
    )
    closest_native = np.array(
        [native.closest_u(q, golden_iters=64) for q in queries]
    )
    closest_fminbound = np.array([oracle.closest_u(q) for q in queries])
    lookahead = np.stack([native.lookahead(u, CFG.lookahead) for u in us])
    return dict(
        wps=WPS, length=np.float64(L), us=us, points=pts, gradients=grads,
        angles=angles, queries=queries, closest_native=closest_native,
        closest_fminbound=closest_fminbound, lookahead=lookahead,
    )


def reward_fixture() -> dict:
    obs = RNG.uniform(-1.0, 1.0, (200, 27))
    has_obs = RNG.random(200) < 0.7
    collided = RNG.random(200) < 0.1
    t_new = RNG.integers(1, CFG.n_steps + 1, 200)
    rewards = np.empty(200)
    dones = np.empty(200, bool)
    for i in range(200):
        rewards[i], dones[i] = oracle_reward(
            obs[i], has_obs[i], collided[i], int(t_new[i])
        )
    return dict(
        obs=obs, has_obs=has_obs, collided=collided, t_new=t_new,
        rewards=rewards, dones=dones,
    )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    np.savez(os.path.join(OUT, "golden_physics.npz"), **physics_fixture())
    np.savez(os.path.join(OUT, "golden_path.npz"), **path_fixture())
    np.savez(os.path.join(OUT, "golden_reward.npz"), **reward_fixture())
    for f in sorted(os.listdir(OUT)):
        print(f, os.path.getsize(os.path.join(OUT, f)), "bytes")


if __name__ == "__main__":
    main()
