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


def test_truncated_only_on_step_cap():
    """gymnasium semantics: the step-cap end (end4) reports truncated; a real
    MDP end (collision / reach / AA-angle) reports terminated — derived from
    the env's `terminal` info flag, not inferred from the step count."""
    # hover to the 5-step cap: truncated, not terminated
    env = make("large", path_table_n=128, n_steps=5)
    env.reset_seeded(seed=0)
    for _ in range(5):
        obs, r, terminated, truncated, info = env.step_gymnasium([0.0, 0.0])
    assert truncated and not terminated

    # spin until the AA-angle termination fires: terminated, not truncated
    env2 = make("large", path_table_n=128, n_steps=500)
    env2.reset_seeded(seed=0)
    terminated = truncated = False
    for _ in range(200):
        obs, r, terminated, truncated, info = env2.step_gymnasium([1.0, -1.0])
        if terminated or truncated:
            break
    assert terminated and not truncated


def test_gym_registration():
    """When gymnasium (or classic gym) is installed, real env ids register
    (reference main.py:138-154).  Skipped when no gym flavor is present."""
    try:
        import gymnasium as g
    except ImportError:
        g = pytest.importorskip("gym", reason="neither gymnasium nor gym installed")

    from drone2d_tpu.compat import register_gym_envs

    register_gym_envs()
    env = g.make("drone2d_tpu/corridor-v0", path_table_n=128, n_steps=16)
    obs, info = env.reset(seed=0)
    assert obs.shape == (27,)
    obs, reward, terminated, truncated, info = env.step([0.0, 0.0])
    assert isinstance(reward, float) or hasattr(reward, "item")
    env.close()


def test_agent_name_derivation():
    from drone2d_tpu.eval.run import _derive_agent_name

    assert _derive_agent_name("logs/new_agent.npz") == "new_agent"
    assert _derive_agent_name("somewhere/agent_19.npz") == "agent_19"
    assert _derive_agent_name("agent-s63.npz") == "agent_s63"
    assert _derive_agent_name("logs/ckpt/") == "ckpt"
    assert _derive_agent_name("random") == "random"


def test_vector_env_step_and_autoreset():
    """Drone2dVectorEnv conforms to the gymnasium VectorEnv surface with
    NEXT_STEP autoreset: a truncated env returns (reset obs, reward 0,
    not done) on the following step with its info masked out."""
    gym = pytest.importorskip("gymnasium")
    from drone2d_tpu.compat import Drone2dVectorEnv

    n = 4
    env = Drone2dVectorEnv(
        num_envs=n, scenario="large", path_table_n=128, n_steps=5
    )
    assert env.metadata["autoreset_mode"] is gym.vector.AutoresetMode.NEXT_STEP
    assert env.single_observation_space.shape == (27,)
    assert env.observation_space.shape == (n, 27)

    obs, infos = env.reset(seed=0)
    assert obs.shape == (n, 27) and obs.dtype == np.float32

    actions = np.zeros((n, 2), np.float32)
    for t in range(5):
        obs, reward, terminated, truncated, infos = env.step(actions)
        assert obs.shape == (n, 27) and reward.shape == (n,)
        assert terminated.dtype == bool and truncated.dtype == bool
        assert not np.any(terminated & truncated)
        assert "APE" in infos and "_APE" in infos
    # hovering to the 5-step cap truncates every env...
    assert np.all(truncated) and not np.any(terminated)
    # ...and the NEXT step is the reset transition: reward 0, not done,
    # info masked out for the resetting envs
    obs2, reward2, terminated2, truncated2, infos2 = env.step(actions)
    assert np.all(reward2 == 0.0)
    assert not np.any(terminated2 | truncated2)
    assert not np.any(infos2["_APE"])
    assert np.all(np.isfinite(obs2))
    env.close()
    assert env.closed


def test_vector_env_via_make_vec():
    """gymnasium.make_vec resolves the registered vector entry point to the
    batched on-device env (the reference's SubprocVecEnv capability)."""
    gym = pytest.importorskip("gymnasium")
    from drone2d_tpu.compat import Drone2dVectorEnv, register_gym_envs

    register_gym_envs()
    env = gym.make_vec(
        "drone2d_tpu/corridor-v0", num_envs=3, path_table_n=128, n_steps=8
    )
    assert isinstance(env.unwrapped, Drone2dVectorEnv)
    assert env.num_envs == 3
    obs, _ = env.reset(seed=1)
    assert obs.shape == (3, 27)
    obs, reward, terminated, truncated, infos = env.step(np.zeros((3, 2)))
    assert reward.shape == (3,)
    env.close()
