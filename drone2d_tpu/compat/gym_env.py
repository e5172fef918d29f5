"""Drop-in single-env adapter with the reference's gym 0.21 surface.

The reference publishes `Drone2dEnv(gym.Env)` with the OLD gym API
(`drone_2d_env.py:394,775,908,914`): `reset() -> obs`,
`step(a) -> (obs, reward, done, info)`, `render()`, `close()`, plus
`observation_space`/`action_space` Box[-1,1] (:155-162).  Anyone migrating
from the reference gets the identical interface here — numpy in/out, the
jitted TPU env underneath, host-side rendering on demand.

For throughput use the batched native API (`Drone2DEnv` /
`PPOLearner`) — this adapter exists for interface parity, SB3-style
scripts, and notebooks.  A `gymnasium` 5-tuple variant is exposed via
`step_gymnasium` and `reset_seeded`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from drone2d_tpu.config import EnvConfig
from drone2d_tpu.env.env import ACT_DIM, OBS_DIM, Drone2DEnv


class _Box:
    """Minimal Box space (keeps the adapter importable without gym installed;
    gym/gymnasium Box duck-compatible: low/high/shape/dtype/sample/contains)."""

    def __init__(self, low: float, high: float, shape: Tuple[int, ...]):
        self.low = np.full(shape, low, np.float32)
        self.high = np.full(shape, high, np.float32)
        self.shape = shape
        self.dtype = np.float32

    def sample(self, rng: Optional[np.random.Generator] = None) -> np.ndarray:
        rng = rng or np.random.default_rng()
        return rng.uniform(self.low, self.high).astype(np.float32)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return x.shape == self.shape and bool(
            np.all(x >= self.low - 1e-6) and np.all(x <= self.high + 1e-6)
        )


class Drone2dGymEnv:
    """Single-env, host-facing wrapper of the pure-function env."""

    metadata = {"render.modes": ["human", "rgb_array"]}

    def __init__(self, seed: int = 0, global_step: int = 0, **config_overrides):
        self.cfg = EnvConfig(**config_overrides)
        self._env = Drone2DEnv(self.cfg)
        self._step = jax.jit(self._env.step)
        self._reset = jax.jit(lambda k: self._env.reset(k, global_step))
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._renderer = None
        self._screen = None
        self._trail: list = []

        self.observation_space = _Box(-1.0, 1.0, (OBS_DIM,))
        self.action_space = _Box(-1.0, 1.0, (ACT_DIM,))

    # -- gym 0.21 surface ----------------------------------------------------

    def seed(self, seed: int) -> None:
        self._key = jax.random.PRNGKey(seed)

    def reset(self) -> np.ndarray:
        self._key, k = jax.random.split(self._key)
        self._state, obs = self._reset(k)
        self._trail = []
        return np.asarray(obs)

    def step(self, action) -> Tuple[np.ndarray, float, bool, dict]:
        if self._state is None:
            raise RuntimeError("call reset() before step()")
        a = np.clip(np.asarray(action, np.float32), -1.0, 1.0)
        out = self._step(self._state, a)
        self._state = out.state
        info = {k: np.asarray(v).item() for k, v in out.info.items()}
        return (
            np.asarray(out.obs),
            float(out.reward),
            bool(out.done),
            info,
        )

    def render(self, mode: str = "human"):
        import os

        from drone2d_tpu.eval.render import SceneRenderer, _flip

        if self._renderer is None:
            self._renderer = SceneRenderer(self.cfg)
        r = self._renderer
        state = self._state
        path_coords = obstacles = None
        if self.cfg.mode != "test":
            from drone2d_tpu.utils.host_path import HostQPMI

            n = int(np.asarray(state.path.n_wps))
            path_coords = HostQPMI(np.asarray(state.path.wps)[:n]).coords(100)
            obstacles = (
                np.asarray(state.obstacles.xy),
                np.asarray(state.obstacles.r),
                np.asarray(state.obstacles.mask),
            )
        pos = np.asarray(state.body.pos)
        self._trail.append((float(pos[0]), _flip(float(pos[1]), self.cfg.screensize_y)))
        r.draw_scene(path_coords, obstacles)
        if len(self._trail) > 2:
            r.draw_flight_path(self._trail, (16, 19, 97))
        r.draw_drone(pos, float(np.asarray(state.body.angle)))

        if mode == "rgb_array":
            return r.frame()
        import pygame

        if self._screen is None:
            os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
            pygame.display.init()
            self._screen = pygame.display.set_mode(
                (int(self.cfg.screensize_x), int(self.cfg.screensize_y))
            )
        self._screen.blit(r.surface, (0, 0))
        pygame.display.flip()
        return None

    def close(self) -> None:
        if self._screen is not None:
            import pygame

            pygame.display.quit()
            self._screen = None

    # -- gymnasium-style variants -------------------------------------------

    def reset_seeded(self, *, seed: Optional[int] = None):
        if seed is not None:
            self.seed(seed)
        return self.reset(), {}

    def step_gymnasium(self, action):
        obs, reward, done, info = self.step(action)
        # terminated = a real MDP end (collision / reach-end / AA-angle);
        # truncated = only the step cap fired.  Derived from the env's
        # `terminal` info flag, so a collision exactly at the step cap is
        # still reported as terminated.
        terminated = done and bool(info["terminal"])
        truncated = done and not terminated
        return obs, reward, terminated, truncated, info


def make(scenario: Optional[str] = None, **overrides) -> Drone2dGymEnv:
    """gym.make-style constructor: make('corridor') or make() for curriculum
    (reference registers 'drone-2d-custom-v0' ids in main.py:138-154)."""
    if scenario is not None:
        from drone2d_tpu.eval.run import scenario_config

        cfg = scenario_config(scenario)
        overrides = {**dict(mode=cfg.mode, scenario=cfg.scenario), **overrides}
    return Drone2dGymEnv(**overrides)


def register_gym_envs() -> list:
    """Register real `drone2d_tpu/<scenario>-v0` env ids with gymnasium (or
    classic gym >= 0.26) when one is installed — the parity surface for the
    reference's `gym.envs.registration.register('drone-2d-custom-...')`
    calls (main.py:138-154, 150-154, 213-217, 244-248).

    Returns the list of ids registered this call ([] when no gym flavor is
    importable or everything was already registered).  After it,
    `gym.make("drone2d_tpu/corridor-v0")` yields a fully standard Env.
    """
    try:
        import gymnasium as g
    except ImportError:
        try:
            import gym as g  # classic gym, >=0.26 API assumed
        except ImportError:
            return []

    class _Adapter(g.Env):
        """gymnasium.Env shim over Drone2dGymEnv (5-tuple step API)."""

        metadata = {"render_modes": ["rgb_array"], "render_fps": 60}

        def __init__(self, scenario=None, render_mode=None, **overrides):
            super().__init__()
            self._e = make(scenario, **overrides)
            self.render_mode = render_mode
            # The reference declares Box[-1,1] (drone_2d_env.py:158-162) but
            # several obs dims legitimately exceed it (velocity/target-delta
            # terms are normalized, not clipped).  The legacy make() path
            # keeps the reference-parity bounds; here we declare the honest
            # space so gymnasium's passive env checker stays quiet.
            self.observation_space = g.spaces.Box(
                -np.inf, np.inf, (OBS_DIM,), np.float32
            )
            self.action_space = g.spaces.Box(-1.0, 1.0, (ACT_DIM,), np.float32)

        def reset(self, *, seed=None, options=None):
            return self._e.reset_seeded(seed=seed)

        def step(self, action):
            return self._e.step_gymnasium(action)

        def render(self):
            return self._e.render("rgb_array")

        def close(self):
            self._e.close()

    from drone2d_tpu.config import ALL_SCENARIOS

    # gymnasium (not classic gym) also gets the batched VectorEnv entry
    # point: gym.make_vec("drone2d_tpu/<scenario>-v0", num_envs=N) — the
    # reference's SubprocVecEnv capability as one on-device program
    # (compat/vector_env.py)
    vector_kwargs = {}
    if hasattr(g, "make_vec"):
        from drone2d_tpu.compat.vector_env import Drone2dVectorEnv

        vector_kwargs = {"vector_entry_point": Drone2dVectorEnv}

    registered = []
    specs = [("curriculum", None)] + [(s, s) for s in ALL_SCENARIOS]
    for name, scenario in specs:
        env_id = f"drone2d_tpu/{name}-v0"
        if env_id in getattr(g.envs, "registry", {}):
            continue
        try:
            g.register(
                id=env_id,
                entry_point=_Adapter,
                kwargs={"scenario": scenario},
                max_episode_steps=None,  # the env truncates itself at n_steps
                **vector_kwargs,
            )
            registered.append(env_id)
        except Exception:
            pass  # id collision across repeat imports is fine
    return registered
