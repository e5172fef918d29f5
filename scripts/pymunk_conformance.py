"""North-star conformance harness (SURVEY.md §4): step the ACTUAL reference
pymunk env against the JAX env with identical scenario geometry, start pose,
and action script, and compare position/observation/reward trajectories.

pymunk (and the reference's old-gym dependency surface) are not installable
in the build image, so this lives under scripts/ rather than tests/ (ADVICE
r4: keep the capability instead of deleting it with the dead pytest module).
Day-to-day conformance is carried by the committed golden fixtures
(tests/test_golden.py), the float64 C++ oracle, and the transplanted-agent
campaign reproduction (artifacts/conformance/report.json, 23/23).

On a machine with `pip install pymunk pygame gym==0.21 scipy`:

    python scripts/pymunk_conformance.py            # reference autodetected
    DRONE2D_REFERENCE=/path/to/checkout python scripts/pymunk_conformance.py

Exits 0 when every compared step agrees within tolerance, 1 on mismatch,
2 when the reference stack is unavailable.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REFERENCE = os.environ.get("DRONE2D_REFERENCE", "/root/reference")
REF_PKG = os.path.join(REFERENCE, "drone_2d_custom_gym_env")

T_COMPARE = 30          # horizon before contact micro-dynamics can diverge
POS_TOL = 2.0           # px
OBS_TOL = 5e-3          # normalized units
REW_TOL = 5e-2

SCENARIOS = ("parallel", "corridor")


def _reference_env(scenario: str):
    import random

    from drone_2d_env import Drone2dEnv  # reference module (sys.path'd)

    random.seed(7)
    np.random.seed(7)
    kwargs = dict(
        render_sim=False, render_path=False, render_shade=False,
        render_text=False, shade_distance=75, n_steps=1100, n_fall_steps=0,
        change_target=False, initial_throw=False, random_path_spawn=True,
        path_segment_length=100, n_wps=12, screensize_x=1300,
        screensize_y=1300, lookahead=220, spawn_corners=(1, 4),
        danger_range=150, danger_angle=20, abs_inv_CA_min_rew=1 / 8,
        PA_band_edge=40, PA_scale=2, PP_vel_scale=0.08, PP_rew_max=2.5,
        PP_rew_min=-1, rew_collision=-50, reach_end_radius=20,
        rew_reach_end=30, AA_angle=np.pi / 2, AA_band=np.pi / 4, rew_AA=-1,
        use_Lambda=True, mode="test", scenario=scenario,
    )
    return Drone2dEnv(**kwargs)


def compare_scenario(scenario: str) -> list:
    """Run the lockstep comparison; returns a list of mismatch strings."""
    import jax
    import jax.numpy as jnp

    from drone2d_tpu.config import EnvConfig
    from drone2d_tpu.env.env import Drone2DEnv

    ref = _reference_env(scenario)
    ref.reset()

    # identical start pose: copy the reference's sampled spawn into our state
    body = ref.drone.frame_shape.body
    start = np.array([body.position.x, body.position.y])
    angle = float(body.angle)

    cfg = EnvConfig(mode="test", scenario=scenario)
    env = Drone2DEnv(cfg)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    state = state._replace(
        body=state.body._replace(
            pos=jnp.asarray(start, jnp.float32),
            vel=jnp.zeros(2, jnp.float32),
            angle=jnp.float32(angle),
            omega=jnp.float32(0.0),
        ),
        la_locked=jnp.asarray(False),
    )
    step = jax.jit(env.step)

    errors = []
    rng = np.random.default_rng(3)
    actions = rng.uniform(-0.3, 0.5, (T_COMPARE, 2))
    for t in range(T_COMPARE):
        ref_obs, ref_rew, ref_done, _ = ref.step(actions[t].tolist())
        out = step(state, jnp.asarray(actions[t], jnp.float32))
        state = out.state

        pos = np.asarray(state.body.pos)
        ref_pos = np.array([body.position.x, body.position.y])
        if np.abs(pos - ref_pos).max() >= POS_TOL:
            errors.append(f"{scenario} t={t}: pos {pos} vs ref {ref_pos}")
        obs_err = np.abs(
            np.asarray(out.obs, np.float64) - np.asarray(ref_obs, np.float64)
        ).max()
        if obs_err >= OBS_TOL:
            errors.append(f"{scenario} t={t}: obs max err {obs_err:.2e}")
        if abs(float(out.reward) - float(ref_rew)) >= REW_TOL:
            errors.append(
                f"{scenario} t={t}: reward {float(out.reward):.4f} vs "
                f"{float(ref_rew):.4f}"
            )
        if bool(out.done) != bool(ref_done):
            errors.append(f"{scenario} t={t}: done {bool(out.done)} vs {ref_done}")
        if errors or ref_done:
            break
    return errors


def main() -> int:
    if not os.path.isdir(REF_PKG):
        print(f"reference checkout not found at {REF_PKG} "
              f"(set DRONE2D_REFERENCE)", file=sys.stderr)
        return 2
    try:
        import pymunk  # noqa: F401
        import gym  # noqa: F401
    except ImportError as e:
        print(f"reference stack unavailable in this image: {e}\n"
              f"install with: pip install pymunk pygame 'gym==0.21' scipy",
              file=sys.stderr)
        return 2
    sys.path.insert(0, REF_PKG)

    failures = []
    for scenario in SCENARIOS:
        errs = compare_scenario(scenario)
        status = "OK" if not errs else "MISMATCH"
        print(f"{scenario}: {status}")
        for e in errs:
            print(f"  {e}")
        failures += errs
    print("PYMUNK CONFORMANCE", "OK" if not failures else "FAILED")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
