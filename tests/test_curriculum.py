"""Curriculum staging statistics vs the reference's stage logic
(drone_2d_env.py:324-373, obstacles.py:58-89)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drone2d_tpu.config import EnvConfig
from drone2d_tpu.env import scenarios
from drone2d_tpu.env.env import Drone2DEnv
from drone2d_tpu.ops import path as jpath

CFG = EnvConfig(path_table_n=128)


def test_stage_schedule_boundaries():
    f = scenarios.stage_from_step
    assert int(f(0)) == 1
    assert int(f(699_999)) == 1
    assert int(f(700_000)) == 2
    assert int(f(999_999)) == 2
    assert int(f(1_000_000)) == 3
    assert int(f(1_599_999)) == 3
    assert int(f(1_600_000)) == 4
    assert int(f(1_999_999)) == 4
    assert int(f(2_000_000)) == 5
    assert int(f(9_000_000)) == 5


def test_spawn_chances_ramp():
    # stage 3: 0.2 -> 0.6 over [1.0M, 1.6M] (drone_2d_env.py:336-343)
    assert float(scenarios.stage3_spawn_chance(1_000_000)) == pytest.approx(0.2)
    assert float(scenarios.stage3_spawn_chance(1_300_000)) == pytest.approx(0.4, abs=0.01)
    assert float(scenarios.stage3_spawn_chance(1_600_000)) == pytest.approx(0.6)
    # stage 4: 0.6 -> 1.0 over [1.6M, 2.0M] (:348-357)
    assert float(scenarios.stage4_spawn_chance(1_600_000)) == pytest.approx(0.6)
    assert float(scenarios.stage4_spawn_chance(2_000_000)) == pytest.approx(1.0)


def _count_obstacles(stage, global_step, n=300):
    cfg = CFG
    wps = scenarios.random_corner_waypoints(jax.random.PRNGKey(0), cfg)
    pd = jpath.make_path(wps, jnp.int32(cfg.n_wps), table_n=cfg.path_table_n)

    def one(key):
        _, _, mask = scenarios.curriculum_obstacles(
            key, cfg, pd, jnp.int32(stage), global_step
        )
        return jnp.sum(mask.astype(jnp.int32))

    keys = jax.random.split(jax.random.PRNGKey(1), n)
    return np.asarray(jax.jit(jax.vmap(one))(keys))


def test_stage1_and_2_no_obstacles():
    assert np.all(_count_obstacles(1, 0) == 0)
    assert np.all(_count_obstacles(2, 800_000) == 0)


def test_stage3_spawn_rate_matches_chance():
    counts = _count_obstacles(3, 1_300_000)  # chance ~0.4
    assert set(np.unique(counts)) <= {0, 1}
    rate = counts.mean()
    assert 0.28 <= rate <= 0.52, rate


def test_stage4_always_one_on_path_at_2M():
    counts = _count_obstacles(4, -1.0)  # forced stage: chance 1.0
    assert np.all(counts == 1)


def test_stage5_count_distribution():
    """n ~ ceil(N(1, 4)) clamped (drone_2d_env.py:362-372): zero when n<-3,
    one for -3<n<0, plus the on-path obstacle whenever count>0."""
    counts = _count_obstacles(5, 2_500_000, n=600)
    assert counts.max() <= CFG.max_curriculum_obs + 1
    # P(N(1,4) < -3) ~ 0.16 -> a nonneglible share of zero-obstacle episodes
    zero_rate = (counts == 0).mean()
    assert 0.05 <= zero_rate <= 0.30, zero_rate
    # mean of ceil(N(1,4)) | positive contributions + 1 on-path: roughly 3-5
    assert 2.0 <= counts.mean() <= 6.0, counts.mean()


def test_near_path_obstacles_keep_margin():
    """Accepted near-path obstacles satisfy |lateral offset| > radius + 10
    (obstacles.py:75-80): the path's closest approach exceeds the radius."""
    cfg = CFG
    wps = scenarios.random_corner_waypoints(jax.random.PRNGKey(5), cfg)
    pd = jpath.make_path(wps, jnp.int32(cfg.n_wps), table_n=512)

    keys = jax.random.split(jax.random.PRNGKey(6), 64)

    def one(key):
        xy, r, mask = scenarios.curriculum_obstacles(
            key, cfg, pd, jnp.int32(5), 2_500_000
        )
        return xy, r, mask

    xys, rs, masks = jax.jit(jax.vmap(one))(keys)
    checked = 0
    for xy, r, mask in zip(np.asarray(xys), np.asarray(rs), np.asarray(masks)):
        # slots [0, max_curriculum_obs) are near-path; last live slot is on-path
        for i in range(cfg.max_curriculum_obs):
            if mask[i]:
                cp = jpath.closest_position(pd, jnp.asarray(xy[i]), golden_iters=16)
                d = float(np.linalg.norm(np.asarray(cp) - xy[i]))
                assert d > r[i] - 1.0, (d, r[i])  # margin minus refine slack
                checked += 1
    assert checked > 20


def test_random_corner_paths_start_in_corner():
    cfg = CFG
    for corner_seed in range(8):
        wps = np.asarray(
            scenarios.random_corner_waypoints(jax.random.PRNGKey(corner_seed), cfg)
        )
        x1, y1 = wps[0]
        assert (100 <= x1 <= 180) or (cfg.screensize_x - 180 <= x1 <= cfg.screensize_x - 100)
        assert (100 <= y1 <= 180) or (cfg.screensize_y - 180 <= y1 <= cfg.screensize_y - 100)
        # consecutive segments have the configured length
        seg = np.linalg.norm(np.diff(wps[: cfg.n_wps], axis=0), axis=1)
        np.testing.assert_allclose(seg, cfg.path_segment_length, rtol=1e-5)


def test_stage_schedule_64bit_safe():
    """The curriculum clock is a float32 step count; it must keep working
    far past the int32 wrap at 2.1B (VERDICT r1 weak #5)."""
    f = scenarios.stage_from_step
    assert int(f(jnp.float32(3e9))) == 5
    assert int(f(jnp.float32(2**31 + 2**17))) == 5
    # scaled schedules at billion-step budgets stay in range too
    assert int(f(jnp.float32(3e9) / 400.0)) == 5
    assert int(f(jnp.float32(3e8) / 400.0)) == 2


def test_stage_mix_rehearses_all_stages():
    """stage_mix_prob=1 at global_step 0 must produce obstacle-bearing
    episodes (stages 3/4/5 drawn) AND obstacle-free ones (stages 1/2);
    stage_mix_prob=0 at step 0 is pure stage 1 (reference schedule)."""
    ks = jax.random.split(jax.random.PRNGKey(7), 64)

    env0 = Drone2DEnv(CFG.replace(stage_mix_prob=0.0))
    s0, _ = jax.jit(jax.vmap(lambda k: env0.reset(k, 0)))(ks)
    counts0 = np.asarray(jnp.sum(s0.obstacles.mask, axis=-1))
    assert np.all(counts0 == 0)

    env1 = Drone2DEnv(CFG.replace(stage_mix_prob=1.0))
    s1, _ = jax.jit(jax.vmap(lambda k: env1.reset(k, 0)))(ks)
    counts1 = np.asarray(jnp.sum(s1.obstacles.mask, axis=-1))
    # ~20% stage-4 (forced chance 1.0) + ~12% stage-3 + ~17% stage-5 draws
    assert (counts1 > 0).mean() > 0.15
    assert (counts1 == 0).mean() > 0.3
    # rehearsal also re-enables stage-2 anywhere-spawn: some spawns far
    # from the path start
    d = np.linalg.norm(
        np.asarray(s1.body.pos) - np.asarray(s1.path.wps[:, 0]), axis=-1
    )
    assert (d > 50).mean() > 0.05


def test_stage_mix_never_applies_to_forced_stage_eval():
    """Forced-stage eval scenarios (scenario='stage_k') ignore rehearsal —
    the published per-stage benchmarks must stay pure.  Applies to ALL
    rehearsal families: stage_mix, corridor_mix, cross_mix."""
    ks = jax.random.split(jax.random.PRNGKey(8), 32)
    env = Drone2DEnv(CFG.replace(scenario="stage_1", stage_mix_prob=1.0))
    s, _ = jax.jit(jax.vmap(lambda k: env.reset(k, 0)))(ks)
    assert np.all(np.asarray(jnp.sum(s.obstacles.mask, axis=-1)) == 0)

    env2 = Drone2DEnv(
        CFG.replace(scenario="stage_1", corridor_mix_prob=1.0,
                    cross_mix_prob=1.0)
    )
    s2, _ = jax.jit(jax.vmap(lambda k: env2.reset(k, 0)))(ks)
    # stage 1 has no obstacles; any corridor wall / crossing wall leaking in
    # would show up as a non-empty obstacle mask
    assert np.all(np.asarray(jnp.sum(s2.obstacles.mask, axis=-1)) == 0)


def test_stage2_spawns_anywhere_stage1_at_start():
    env = Drone2DEnv(CFG.replace(mode="curriculum"))
    # stage 1 (global_step 0): spawn at path start
    s1, _ = jax.jit(lambda k: env.reset(k, 0))(jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        np.asarray(s1.body.pos), np.asarray(s1.path.wps[0]), atol=1e-4
    )
    # stage 2: positions spread over the screen, usually NOT the path start
    ks = jax.random.split(jax.random.PRNGKey(3), 16)
    s2, _ = jax.jit(jax.vmap(lambda k: env.reset(k, 800_000)))(ks)
    d = np.linalg.norm(
        np.asarray(s2.body.pos) - np.asarray(s2.path.wps[:, 0]), axis=-1
    )
    assert (d > 50).mean() > 0.8
