"""Environment semantics tests: reset/step, rewards, terminations, curriculum."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drone2d_tpu.config import EnvConfig
from drone2d_tpu.env.env import Drone2DEnv, OBS_DIM, _rewards_and_done
from drone2d_tpu.env import scenarios
from drone2d_tpu.ops import physics
from tests.oracle import oracle_reward

CURR_CFG = EnvConfig(mode="curriculum", scenario="None")
STAGE1_CFG = EnvConfig(mode="curriculum", scenario="stage_1")


def test_reset_shapes_and_ranges():
    env = Drone2DEnv(STAGE1_CFG)
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (OBS_DIM,)
    assert obs.dtype == jnp.float32
    # no obstacles in stage 1 -> default obstacle slots
    np.testing.assert_allclose(np.asarray(obs[8:17]), [1, 0, 0, 1, 0, 0, 1, 0, 0])
    assert int(jnp.sum(state.obstacles.mask)) == 0
    # spawned at path start
    np.testing.assert_allclose(np.asarray(state.body.pos), np.asarray(state.path.wps[0]), atol=1e-4)
    assert abs(float(state.body.angle)) <= np.pi / 4


def test_hover_on_path_reward():
    """Stage 1, drone at path start, exact hover thrust: PA=+2 (on path),
    PP~0 (no velocity), CA=0 (no obstacles)."""
    env = Drone2DEnv(STAGE1_CFG)
    state, _ = env.reset(jax.random.key(1))
    # hover: (a/2+0.5)*1000 = 500 per rotor = mg/2
    out = env.step(state, jnp.array([0.0, 0.0]))
    assert not bool(out.done)
    assert float(out.info["path_adherence"]) == pytest.approx(2.0, abs=0.05)
    # spawn angle is random in +-pi/4, so one thrust step develops a small
    # lateral velocity; PP is bounded by 0.08 * |v| with |v| <= ~2*sin(pi/8)*1000/60
    assert abs(float(out.info["path_progression"])) <= 0.08 * 13.0
    assert float(out.info["collision_avoidance_reward"]) == 0.0
    assert float(out.reward) == pytest.approx(
        float(out.info["path_adherence"])
        + float(out.info["path_progression"])
        + float(out.info["agressive_alpha_reward"]),
        abs=1e-5,
    )


def test_reward_matches_oracle_on_random_obs():
    """The reward assembly reproduces the reference equations bit-for-bit
    (float32 vs float64 tolerance) for random observation vectors."""
    cfg = EnvConfig()
    rng = np.random.default_rng(5)
    for i in range(200):
        obs = rng.uniform(-1, 1, OBS_DIM).astype(np.float32)
        has_obs = bool(i % 3)
        collided = i % 7 == 0
        t_new = 1100 if i % 11 == 0 else rng.integers(1, 1099)
        r = _rewards_and_done(
            cfg, jnp.asarray(obs), jnp.asarray(has_obs), jnp.asarray(collided),
            jnp.asarray(t_new, jnp.int32),
        )
        want, want_done = oracle_reward(obs, has_obs, collided, t_new)
        assert float(r["reward"]) == pytest.approx(want, abs=5e-3), (i, obs)
        assert bool(r["done"]) == want_done


def test_collision_terminates():
    env = Drone2DEnv(EnvConfig(mode="test", scenario="large"))
    state, _ = env.reset(jax.random.key(2))
    # teleport into the central obstacle (center 650,650 r=260)
    body = state.body._replace(pos=jnp.array([650.0, 650.0]), vel=jnp.zeros(2))
    out = env.step(state._replace(body=body), jnp.array([0.0, 0.0]))
    assert bool(out.done)
    assert float(out.info["collision_reward"]) == -50.0
    assert int(out.info["n_collisions"]) == 1
    assert int(out.info["n_failed_runs"]) == 1
    assert int(out.info["n_successful_runs"]) == 0
    assert float(out.info["APE"]) > 0.0


def test_reach_end_terminates():
    env = Drone2DEnv(STAGE1_CFG)
    state, _ = env.reset(jax.random.key(3))
    body = state.body._replace(pos=state.target, vel=jnp.zeros(2))
    out = env.step(state._replace(body=body), jnp.array([0.0, 0.0]))
    assert bool(out.done)
    assert float(out.info["reach_end_reward"]) == 30.0
    assert int(out.info["n_successful_runs"]) == 1
    assert int(out.info["n_collisions"]) == 0


def test_aggressive_alpha_terminates():
    env = Drone2DEnv(STAGE1_CFG)
    state, _ = env.reset(jax.random.key(4))
    body = state.body._replace(angle=jnp.float32(np.pi / 2 + 0.05), omega=jnp.float32(0.0))
    out = env.step(state._replace(body=body), jnp.array([-1.0, -1.0]))
    assert bool(out.done)
    assert float(out.info["agressive_alpha_reward"]) == -1.0
    assert int(out.info["n_failed_runs"]) == 1


def test_alpha_band_penalty():
    env = Drone2DEnv(STAGE1_CFG)
    state, _ = env.reset(jax.random.key(4))
    a = np.pi / 3  # inside (band, angle) -> -sin(alpha) after step drift
    body = state.body._replace(angle=jnp.float32(a), omega=jnp.float32(0.0))
    out = env.step(state._replace(body=body), jnp.array([-1.0, -1.0]))
    # angle unchanged by zero-thrust step (omega = 0)
    assert float(out.info["agressive_alpha_reward"]) == pytest.approx(-np.sin(a), abs=1e-5)
    assert not bool(out.done)


def test_timeout_terminates():
    env = Drone2DEnv(STAGE1_CFG)
    state, _ = env.reset(jax.random.key(5))
    state = state._replace(t=jnp.int32(EnvConfig().n_steps - 1))
    out = env.step(state, jnp.array([0.0, 0.0]))
    assert bool(out.done)
    assert int(out.info["n_failed_runs"]) == 1
    assert int(out.info["env_steps"]) == EnvConfig().n_steps


def test_autoreset_produces_fresh_episode():
    env = Drone2DEnv(STAGE1_CFG)
    state, _ = env.reset(jax.random.key(6))
    state = state._replace(t=jnp.int32(EnvConfig().n_steps - 1))
    out = env.step_autoreset(state, jnp.array([0.0, 0.0]), jax.random.key(7))
    assert bool(out.done)  # reports the finished episode
    assert int(out.state.t) == 0  # but carries a fresh one
    assert float(out.state.total_reward) == 0.0


def test_batched_rollout_smoke():
    env = Drone2DEnv(CURR_CFG)
    n = 32
    key = jax.random.key(8)
    state, obs = jax.jit(lambda k: env.reset_batch(k, n, 0))(key)
    assert obs.shape == (n, OBS_DIM)

    @jax.jit
    def run(state, key):
        def body(carry, _):
            state, key = carry
            key, ka, kr = jax.random.split(key, 3)
            act = jax.random.uniform(ka, (n, 2), minval=-1.0, maxval=1.0)
            out = env.step_batch(state, act, kr, 0)
            return (out.state, key), (out.reward, out.done)

        (state, _), (rews, dones) = jax.lax.scan(body, (state, key), None, length=50)
        return state, rews, dones

    state, rews, dones = run(state, key)
    assert rews.shape == (50, n)
    assert not np.any(np.isnan(np.asarray(rews)))
    assert np.all(np.asarray(state.t) >= 0)


@pytest.mark.parametrize(
    "step,stage",
    [(0, 1), (699_999, 1), (700_000, 2), (999_999, 2), (1_000_000, 3),
     (1_599_999, 3), (1_600_000, 4), (1_999_999, 4), (2_000_000, 5), (9_000_000, 5)],
)
def test_stage_schedule(step, stage):
    assert int(scenarios.stage_from_step(step)) == stage


def test_stage2_spawns_randomly():
    env = Drone2DEnv(EnvConfig(mode="curriculum", scenario="stage_2"))
    keys = jax.random.split(jax.random.key(9), 16)
    states, _ = jax.vmap(lambda k: env.reset(k, 0))(keys)
    starts = np.asarray(states.path.wps[:, 0])
    poss = np.asarray(states.body.pos)
    # essentially never exactly at path start
    assert np.mean(np.linalg.norm(starts - poss, axis=1) > 10) > 0.9
    assert np.all(poss >= 100 - 1e-3) and np.all(poss <= 1200 + 1e-3)


def test_stage5_spawns_obstacles():
    env = Drone2DEnv(EnvConfig(mode="curriculum", scenario="None"))
    keys = jax.random.split(jax.random.key(10), 64)
    states, _ = jax.vmap(lambda k: env.reset(k, 3_000_000))(keys)
    counts = np.asarray(jnp.sum(states.obstacles.mask, axis=1))
    # stage 5: n ~ N(1,4) near-path (+1 on-path when n>0); ~15% zero draws
    assert counts.max() > 3
    assert (counts == 0).mean() < 0.5
    # all live obstacles have sane radii
    r = np.asarray(states.obstacles.r)
    m = np.asarray(states.obstacles.mask)
    assert np.all(r[m] >= 10.0 - 1e-5) and np.all(r[m] <= 50.0 + 1e-5)


def test_stage1_and_2_no_obstacles():
    env = Drone2DEnv(EnvConfig(mode="curriculum", scenario="None"))
    for step in (0, 800_000):
        keys = jax.random.split(jax.random.key(11), 8)
        states, _ = jax.vmap(lambda k: env.reset(k, step))(keys)
        assert int(jnp.sum(states.obstacles.mask)) == 0


def test_lookahead_lock_persists():
    env = Drone2DEnv(STAGE1_CFG)
    state, _ = env.reset(jax.random.key(12))
    # place drone near the goal: lookahead clamps to path end -> locks
    near_goal = state.target - jnp.array([30.0, 0.0])
    body = state.body._replace(pos=near_goal)
    out = env.step(state._replace(body=body), jnp.array([0.0, 0.0]))
    assert bool(out.state.la_locked)
    # obs 21,22 are the (normalized) goal coords while locked
    W, H = 1300.0, 1300.0
    np.testing.assert_allclose(
        np.asarray([(out.obs[21] + 1) * W / 2, (out.obs[22] + 1) * H / 2]),
        np.asarray(state.target),
        atol=0.5,
    )


def test_split_carry_bitexact():
    """The split-carry hot loop (step_autoreset_split) must be bit-exact vs
    the carried-template loop (step_autoreset_template) across several
    done/auto-reset boundaries: per-step obs/reward/done/info AND the final
    materialized EnvState (via types.finalize_split) are compared leaf by
    leaf with exact equality.  This is the claim the env/types docstrings
    make; the same blend-vs-carry induction argument is only as good as
    this lock."""
    from drone2d_tpu.env.types import finalize_split, split_state

    cfg = EnvConfig(
        mode="curriculum", scenario="None", n_steps=30, path_table_n=256
    )
    env = Drone2DEnv(cfg)
    N, T = 16, 75  # 30-step timeout cap -> >=2 reset boundaries per env
    init_state, init_obs = env.reset_batch(jax.random.key(40), N, 2_500_000)
    tmpl_state, tmpl_obs = env.reset_batch(jax.random.key(41), N, 2_500_000)
    actions = jax.random.uniform(
        jax.random.key(42), (T, N, 2), minval=-1.0, maxval=1.0
    )

    def tmpl_scan(carry, a):
        state, obs = carry
        out = env.step_batch_template(state, a, tmpl_state, tmpl_obs)
        return (out.state, out.obs), (out.obs, out.reward, out.done, out.info)

    (final_tmpl, _), ys_tmpl = jax.lax.scan(
        tmpl_scan, (init_state, init_obs), actions
    )

    init_static, init_dyn = split_state(init_state)
    tmpl_static, tmpl_dyn = split_state(tmpl_state)

    def split_scan(carry, a):
        dyn, fresh, obs = carry
        dyn, fresh, obs, rew, done, info = env.step_batch_split(
            dyn, fresh, a, init_static, tmpl_static, tmpl_dyn, tmpl_obs
        )
        return (dyn, fresh, obs), (obs, rew, done, info)

    fresh0 = jnp.zeros((N,), bool)
    (final_dyn, final_fresh, _), ys_split = jax.lax.scan(
        split_scan, (init_dyn, fresh0, init_obs), actions
    )
    final_split = finalize_split(init_static, tmpl_static, final_fresh, final_dyn)

    dones = np.asarray(ys_tmpl[2])
    assert dones.sum() >= 2 * N  # the comparison spans real reset boundaries
    assert bool(np.asarray(final_fresh).all())

    for got, want in zip(jax.tree.leaves(ys_split), jax.tree.leaves(ys_tmpl)):
        assert np.array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(jax.tree.leaves(final_split), jax.tree.leaves(final_tmpl)):
        assert np.array_equal(np.asarray(got), np.asarray(want))


# -- initial motion (drone_2d_env.py:917-946 port; VERDICT r3 weak #3) --------


def test_initial_motion_matches_closed_form():
    """The optional throw+settle must equal a float64 closed-form rollout of
    the same draws: one Chipmunk-order step with the throw force + rotation
    couple, then n_fall_steps of free fall (gravity only, omega frozen)."""
    cfg = STAGE1_CFG.replace(initial_motion_enabled=True, n_fall_steps=5)
    env = Drone2DEnv(cfg)
    key = jax.random.key(77)
    state, _ = env.reset(key)

    # reproduce the throw draws from the same stream (env.py reset splits 7
    # keys; k_throw is the 6th, then _initial_motion splits it into 3)
    k_throw = jax.random.split(key, 7)[5]
    ka, kf, kr = jax.random.split(k_throw, 3)
    throw_angle = float(jax.random.uniform(ka, ()))  * 2 * np.pi
    throw_force = float(jax.random.uniform(kf, (), minval=0.0, maxval=1500.0))
    rot = float(jax.random.uniform(kr, (), minval=-3000.0, maxval=3000.0))

    # the pre-throw pose: same reset with the motion gate off shares every
    # other stream, so its body is the starting point of the closed form
    state0, _ = Drone2DEnv(STAGE1_CFG).reset(key)
    p0 = np.asarray(state0.body.pos, np.float64)
    a0 = float(state0.body.angle)
    dt, g = cfg.physics_dt, np.array([0.0, cfg.gravity_y])
    m, inertia, r = cfg.total_mass, cfg.moment_of_inertia, cfg.drone_radius

    # throw step (position first with old vel=0, then velocity update)
    f = throw_force * np.array([np.cos(throw_angle), np.sin(throw_angle)])
    vel = (g + f / m) * dt
    omega = (-2.0 * r * rot) / inertia * dt
    pos, ang = p0.copy(), a0
    # settle: free fall, omega frozen (no torque, damping 1.0)
    for _ in range(cfg.n_fall_steps):
        pos = pos + vel * dt
        ang = ang + omega * dt
        vel = vel + g * dt

    np.testing.assert_allclose(np.asarray(state.body.pos), pos, atol=2e-3)
    np.testing.assert_allclose(float(state.body.angle), ang, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.body.vel), vel, atol=2e-3)
    np.testing.assert_allclose(float(state.body.omega), omega, atol=1e-5)


def test_initial_motion_noop_config_is_bitexact_with_disabled():
    """initial_throw=False + n_fall_steps=0 makes the enabled gate a no-op:
    reset must be BIT-identical to initial_motion_enabled=False (the throw
    key is pre-split either way, so all other streams coincide)."""
    base = STAGE1_CFG
    noop = base.replace(initial_motion_enabled=True, initial_throw=False,
                        n_fall_steps=0)
    s_a, obs_a = Drone2DEnv(base).reset(jax.random.key(5))
    s_b, obs_b = Drone2DEnv(noop).reset(jax.random.key(5))
    for x, y in zip(jax.tree.leaves(s_a), jax.tree.leaves(s_b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    np.testing.assert_array_equal(np.asarray(obs_a), np.asarray(obs_b))


def test_initial_motion_trains_and_randomizes_starts():
    """Smoke: the feature actually changes episode starts (nonzero initial
    velocity for almost all envs; settle displaces spawn) and a PPO update
    over it stays finite."""
    from drone2d_tpu.config import PPOConfig
    from drone2d_tpu.learn.ppo import PPOLearner

    cfg = EnvConfig(mode="curriculum", scenario="None", path_table_n=128,
                    golden_iters=8, initial_motion_enabled=True)
    env = Drone2DEnv(cfg)
    state, _ = env.reset_batch(jax.random.key(9), 32)
    speeds = np.linalg.norm(np.asarray(state.body.vel), axis=-1)
    assert (speeds > 1.0).mean() > 0.9          # throw + 5 settle steps
    omegas = np.abs(np.asarray(state.body.omega))
    assert (omegas > 1e-3).mean() > 0.9

    learner = PPOLearner(cfg, PPOConfig(n_steps=8, num_minibatches=2,
                                        n_epochs=1), 8)
    st = jax.jit(learner.init)(jax.random.PRNGKey(0))
    st2, metrics = jax.jit(learner.update)(st)
    assert np.isfinite(float(metrics["loss"]))
