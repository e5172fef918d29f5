"""North-star conformance (SURVEY.md §4): step the ACTUAL reference pymunk
env against the JAX env with identical scenario geometry, start pose, and
action script, and compare observation/reward trajectories.

pymunk (and the reference's old-gym dependency surface) are not installed in
this image, so this module skips there — the committed golden fixtures
(tests/test_golden.py) carry conformance day-to-day.  On a machine with
`pip install pymunk pygame gym==0.21 scipy` it runs for real against
/root/reference (or the path in DRONE2D_REFERENCE).
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pymunk = pytest.importorskip("pymunk", reason="pymunk not installed")
pytest.importorskip("gym", reason="classic gym not installed")

REFERENCE = os.environ.get("DRONE2D_REFERENCE", "/root/reference")
REF_PKG = os.path.join(REFERENCE, "drone_2d_custom_gym_env")
if not os.path.isdir(REF_PKG):
    pytest.skip(f"reference checkout not found at {REF_PKG}", allow_module_level=True)
sys.path.insert(0, REF_PKG)

from drone2d_tpu.config import EnvConfig
from drone2d_tpu.env.env import Drone2DEnv

T_COMPARE = 30          # horizon before contact micro-dynamics can diverge
POS_TOL = 2.0           # px
OBS_TOL = 5e-3          # normalized units
REW_TOL = 5e-2


def _reference_env(scenario: str):
    import random

    from drone_2d_env import Drone2dEnv  # noqa: E402 (reference module)

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


@pytest.mark.parametrize("scenario", ["parallel", "corridor"])
def test_step_reference_env_against_jax_env(scenario):
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

    rng = np.random.default_rng(3)
    actions = rng.uniform(-0.3, 0.5, (T_COMPARE, 2))
    for t in range(T_COMPARE):
        ref_obs, ref_rew, ref_done, _ = ref.step(actions[t].tolist())
        out = step(state, jnp.asarray(actions[t], jnp.float32))
        state = out.state

        pos = np.asarray(state.body.pos)
        ref_pos = np.array([body.position.x, body.position.y])
        assert np.abs(pos - ref_pos).max() < POS_TOL, (t, pos, ref_pos)

        obs = np.asarray(out.obs, np.float64)
        np.testing.assert_allclose(
            obs, np.asarray(ref_obs, np.float64), atol=OBS_TOL,
            err_msg=f"obs mismatch at t={t}",
        )
        assert abs(float(out.reward) - float(ref_rew)) < REW_TOL, t
        assert bool(out.done) == bool(ref_done), t
        if ref_done:
            break
