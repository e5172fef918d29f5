"""Scenario geometry conformance: the 7 deterministic benchmarks."""

import numpy as np
import jax
import pytest

from drone2d_tpu.config import EnvConfig, TEST_SCENARIOS
from drone2d_tpu.env import scenarios
from drone2d_tpu.env.env import Drone2DEnv
from tests.oracle import OracleQPMI

W = H = 1300.0


@pytest.mark.parametrize("scen", TEST_SCENARIOS)
def test_scenario_builds_and_is_padded(scen):
    geo = scenarios.build_test_scenario(EnvConfig(mode="test", scenario=scen))
    assert geo.wps.shape == (16, 2)
    assert geo.obs_xy.shape == (64, 2)
    k = int(geo.obs_mask.sum())
    assert k > 0
    # padding entries repeat the last waypoint
    np.testing.assert_allclose(
        geo.wps[geo.n_wps :],
        np.broadcast_to(geo.wps[geo.n_wps - 1], geo.wps[geo.n_wps :].shape),
    )
    # spawn rect is inside the screen and non-degenerate
    xmin, ymin, xmax, ymax = geo.spawn_rect
    assert 0 <= xmin < xmax <= W and 0 <= ymin < ymax <= H


def test_obstacle_counts_match_reference():
    # counts derived from test_scenarios.py:169-246 parameter overrides
    want = {
        "perpendicular": 6,
        "parallel": 6,
        "S_parallel": 20,
        "corridor": 18,     # 9 per offset path (i in 1..9), two sides
        "S_corridor": 58,   # 29 per offset path, two sides
        "impossible": 20,
        "large": 1,
    }
    for scen, k in want.items():
        geo = scenarios.build_test_scenario(EnvConfig(mode="test", scenario=scen))
        assert int(geo.obs_mask.sum()) == k, scen


def test_perpendicular_geometry():
    geo = scenarios.build_test_scenario(EnvConfig(mode="test", scenario="perpendicular"))
    # straight path at y = 650, x in [200, 1100]
    np.testing.assert_allclose(geo.wps[: geo.n_wps, 1], 650.0)
    np.testing.assert_allclose(geo.wps[0], [200.0, 650.0])
    np.testing.assert_allclose(geo.wps[geo.n_wps - 1], [1100.0, 650.0])
    # 6 obstacles r=20 in a vertical line through the midpoint
    xy = geo.obs_xy[geo.obs_mask]
    np.testing.assert_allclose(xy[:, 0], 650.0, atol=1e-3)
    np.testing.assert_allclose(np.sort(xy[:, 1]), 650.0 + np.arange(-100, 101, 40), atol=1e-3)
    np.testing.assert_allclose(geo.obs_r[geo.obs_mask], 20.0)


def test_large_geometry():
    geo = scenarios.build_test_scenario(EnvConfig(mode="test", scenario="large"))
    xy = geo.obs_xy[geo.obs_mask]
    np.testing.assert_allclose(xy[0], [650.0, 650.0])
    np.testing.assert_allclose(geo.obs_r[geo.obs_mask][0], 260.0)
    assert geo.n_wps == 14
    # the path must clear the obstacle by ~margin
    path = OracleQPMI(geo.wps[: geo.n_wps])
    for u in np.linspace(0, path.length, 200):
        assert np.linalg.norm(path(u) - np.array([650.0, 650.0])) > 260.0


def test_parallel_obstacles_on_path():
    geo = scenarios.build_test_scenario(EnvConfig(mode="test", scenario="parallel"))
    path = OracleQPMI(geo.wps[: geo.n_wps])
    for c in geo.obs_xy[geo.obs_mask]:
        assert np.linalg.norm(path.closest_position(c) - c) < 1.0


def test_corridor_obstacles_offset_from_path():
    geo = scenarios.build_test_scenario(EnvConfig(mode="test", scenario="corridor"))
    xy = geo.obs_xy[geo.obs_mask]
    # two walls at y = 650 +- 100, radius 35
    ys = np.unique(np.round(xy[:, 1], 3))
    np.testing.assert_allclose(ys, [550.0, 750.0])
    np.testing.assert_allclose(geo.obs_r[geo.obs_mask], 35.0)


def test_impossible_ring_surrounds_goal():
    geo = scenarios.build_test_scenario(EnvConfig(mode="test", scenario="impossible"))
    goal = geo.wps[geo.n_wps - 1]
    xy = geo.obs_xy[geo.obs_mask]
    d = np.linalg.norm(xy - goal, axis=1)
    np.testing.assert_allclose(d, 100.0, atol=1e-3)


@pytest.mark.parametrize("scen", TEST_SCENARIOS)
def test_env_runs_in_every_scenario(scen):
    env = Drone2DEnv(EnvConfig(mode="test", scenario=scen))
    state, obs = env.reset(jax.random.key(0))
    out = env.step(state, np.array([0.1, 0.1], np.float32))
    assert out.obs.shape == (27,)
    assert np.isfinite(float(out.reward))
    # spawn rectangle respected
    xmin, ymin, xmax, ymax = np.asarray(env._spawn_rect)
    p = np.asarray(state.body.pos)
    assert xmin <= p[0] <= xmax and ymin <= p[1] <= ymax


def test_parallel_boxes_scenario_runs_end_to_end():
    """The box-obstacle scenario variant (Square port, obstacles.py:20-31):
    geometry builds, the env steps with the mixed collision path, and flying
    along the path into the box row eventually collides."""
    import jax.numpy as jnp

    from drone2d_tpu.config import EnvConfig
    from drone2d_tpu.env import scenarios
    from drone2d_tpu.env.env import Drone2DEnv

    cfg = EnvConfig(mode="test", scenario="parallel_boxes", path_table_n=128)
    geo = scenarios.build_test_scenario(cfg)
    assert geo.obs_half_wh is not None
    k = int(geo.obs_mask.sum())
    assert k == 6
    assert np.all(geo.obs_half_wh[:k] == 30.0)
    assert np.all(geo.obs_r[:k] == 0.0)

    env = Drone2DEnv(cfg)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(obs)).all()

    # teleport the drone into the first box: collision must fire
    state2 = state._replace(
        body=state.body._replace(
            pos=jnp.asarray(geo.obs_xy[0], jnp.float32),
            vel=jnp.zeros(2, jnp.float32),
        )
    )
    out = jax.jit(env.step)(state2, jnp.array([0.0, 0.0]))
    assert bool(out.done)
    assert int(out.info["n_collisions"]) == 1
    assert float(out.info["collision_reward"]) == cfg.rew_collision

    # the observation's nearest-obstacle distance uses the box metric:
    # standing 100 px left of the first box face, distance ~ 100 - 30 - 50
    left_of = geo.obs_xy[0] - np.array([130.0, 0.0])
    state3 = state._replace(
        body=state.body._replace(
            pos=jnp.asarray(left_of, jnp.float32),
            angle=jnp.float32(0.0),
        )
    )
    out3 = jax.jit(env.step)(state3, jnp.array([0.0, 0.0]))
    d = float(out3.info["dist_closest_obs"])
    assert 20.0 <= d <= 70.0, d


def test_corridor_rehearsal_obstacles():
    """corridor_obstacles: two wall rows of touching circles at ±offset
    along a random path (EnvConfig.corridor_mix_prob rehearsal family)."""
    import jax.numpy as jnp
    from drone2d_tpu.ops import path as jpath

    cfg = EnvConfig(path_table_n=128, corridor_mix_prob=1.0)
    key = jax.random.PRNGKey(3)
    wps = scenarios.random_corner_waypoints(jax.random.fold_in(key, 0), cfg)
    pd = jpath.make_path(wps, jnp.int32(cfg.n_wps), table_n=cfg.path_table_n)
    xy, r, mask = jax.jit(
        lambda k: scenarios.corridor_obstacles(k, cfg, pd)
    )(jax.random.fold_in(key, 1))

    n_side = (cfg.max_obs - 1) // 2
    assert xy.shape == (cfg.max_obs, 2) and r.shape == (cfg.max_obs,)
    assert int(mask.sum()) == 2 * n_side
    size = float(pd.length - 200.0) / (2 * n_side)
    assert np.allclose(np.asarray(r)[: 2 * n_side], size, atol=1e-3)
    # every wall circle sits 90-180 px laterally off the path
    xy_np, mask_np = np.asarray(xy), np.asarray(mask)
    tab = np.stack([np.asarray(pd.table_x), np.asarray(pd.table_y)], -1)
    for p in xy_np[mask_np]:
        d = np.min(np.linalg.norm(tab - p, axis=-1))
        assert 80.0 <= d <= 190.0, d


def test_corridor_mix_swaps_field_and_spawn():
    """reset with corridor_mix_prob=1: field is the wall family, spawn at
    path start.  (Default-config bit-identity is guarded by the golden
    fixtures: corridor_mix_prob=0 never touches the new keys.)"""
    cfg = EnvConfig(path_table_n=128, corridor_mix_prob=1.0)
    env = Drone2DEnv(cfg)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(7))
    n_side = (cfg.max_obs - 1) // 2
    assert int(state.obstacles.mask.sum()) == 2 * n_side
    assert np.allclose(
        np.asarray(state.body.pos), np.asarray(state.path.wps[0]), atol=1e-4
    )


def test_cross_rehearsal_obstacles():
    """cross_obstacles: one row of 6 touching circles crossing a random path
    (EnvConfig.cross_mix_prob rehearsal family, eval-perpendicular analog)."""
    import jax.numpy as jnp
    from drone2d_tpu.ops import path as jpath

    cfg = EnvConfig(path_table_n=128, cross_mix_prob=1.0)
    key = jax.random.PRNGKey(5)
    wps = scenarios.random_corner_waypoints(jax.random.fold_in(key, 0), cfg)
    pd = jpath.make_path(wps, jnp.int32(cfg.n_wps), table_n=cfg.path_table_n)
    xy, r, mask = jax.jit(
        lambda k: scenarios.cross_obstacles(k, cfg, pd)
    )(jax.random.fold_in(key, 1))

    assert xy.shape == (cfg.max_obs, 2) and r.shape == (cfg.max_obs,)
    assert int(mask.sum()) == 6
    xy_np, r_np = np.asarray(xy)[:6], np.asarray(r)[:6]
    size = r_np[0]
    assert 15.0 <= size <= 40.0 and np.allclose(r_np, size)
    # touching: consecutive centers exactly 2r apart, and collinear
    gaps = np.linalg.norm(np.diff(xy_np, axis=0), axis=-1)
    assert np.allclose(gaps, 2 * size, atol=1e-2), gaps
    v = xy_np[-1] - xy_np[0]
    v = v / np.linalg.norm(v)
    dev = (xy_np - xy_np[0]) - ((xy_np - xy_np[0]) @ v)[:, None] * v[None, :]
    assert np.abs(dev).max() < 1e-2
    # the wall actually crosses near the path: some circle center is within
    # (centering offset 60 + wall half-length) of the path table
    tab = np.stack([np.asarray(pd.table_x), np.asarray(pd.table_y)], -1)
    dmin = min(
        float(np.min(np.linalg.norm(tab - p, axis=-1))) for p in xy_np
    )
    assert dmin <= 2 * size + 60.0, dmin


def test_cross_mix_swaps_field_and_spawn():
    """reset with cross_mix_prob=1: field is the crossing wall, spawn at the
    path start.  (Default-config bit-identity is guarded by the golden
    fixtures: cross_mix_prob=0 never touches fold_in keys 9/10.)"""
    cfg = EnvConfig(path_table_n=128, cross_mix_prob=1.0)
    env = Drone2DEnv(cfg)
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(9))
    assert int(state.obstacles.mask.sum()) == 6
    assert np.allclose(
        np.asarray(state.body.pos), np.asarray(state.path.wps[0]), atol=1e-4
    )


def test_cross_mix_wins_over_corridor_mix():
    """When both rehearsal families fire in one episode the crossing wall
    wins (documented priority in env.reset)."""
    cfg = EnvConfig(
        path_table_n=128, corridor_mix_prob=1.0, cross_mix_prob=1.0
    )
    env = Drone2DEnv(cfg)
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(11))
    assert int(state.obstacles.mask.sum()) == 6
