"""Gym 0.21 API-surface parity tests (reference drone_2d_env.py:155-162,
394, 775, 908, 914)."""

import numpy as np
import pytest

from drone2d_tpu.compat import make


@pytest.fixture(scope="module")
def env():
    return make("large", path_table_n=128, n_steps=64)


def test_spaces(env):
    assert env.observation_space.shape == (27,)
    assert env.action_space.shape == (2,)
    a = env.action_space.sample()
    assert env.action_space.contains(a)


def test_reset_step_cycle(env):
    obs = env.reset()
    assert obs.shape == (27,) and obs.dtype == np.float32
    # target-delta dims (4, 5) may exceed the declared Box, exactly as the
    # reference's unclipped m1to1 does (drone_2d_env.py:648-649); everything
    # else is in range
    in_range = np.delete(np.abs(obs), [4, 5])
    assert np.all(in_range <= 1.0 + 1e-5)
    total = 0.0
    for _ in range(5):
        obs, reward, done, info = env.step([0.0, 0.0])
        total += reward
        assert obs.shape == (27,)
        assert isinstance(reward, float) and isinstance(done, bool)
        for k in ("reward", "env_steps", "APE", "n_collisions",
                  "n_successful_runs", "n_failed_runs", "total_reward"):
            assert k in info, k
    assert np.isfinite(total)


def test_runs_episode_to_done(env):
    env.seed(3)
    env.reset()
    for t in range(64):
        obs, reward, done, info = env.step([-1.0, -1.0])  # free fall
        if done:
            break
    assert done
    assert info["env_steps"] == t + 1


def test_rgb_render(env):
    env.reset()
    env.step([0.0, 0.0])
    frame = env.render(mode="rgb_array")
    assert frame.shape == (int(env.cfg.screensize_y), int(env.cfg.screensize_x), 3)
    assert frame.dtype == np.uint8
    env.close()


def test_gymnasium_five_tuple(env):
    env.reset_seeded(seed=5)
    obs, reward, terminated, truncated, info = env.step_gymnasium([0.0, 0.0])
    assert isinstance(terminated, bool) and isinstance(truncated, bool)


def test_curriculum_mode_default():
    env = make(path_table_n=128, n_steps=32)
    obs = env.reset()
    assert obs.shape == (27,)
    env.step(env.action_space.sample())


def test_step_before_reset_raises():
    env = make("large", path_table_n=128)
    with pytest.raises(RuntimeError):
        env.step([0.0, 0.0])
