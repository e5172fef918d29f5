"""Vectorized gymnasium adapter: the reference's SubprocVecEnv surface, TPU-native.

The reference's only parallelism is SB3's `SubprocVecEnv` — one OS process
per env, cpu_count-2 of them (reference main.py:183-190).  Its capability is
"a standard vector-env interface an external training loop can drive".  This
module exposes that same capability over the on-device batch: a
`gymnasium.vector.VectorEnv` whose `step` is ONE jitted XLA program stepping
all N envs (physics + obs + reward + termination), so external RL code
(cleanrl-style loops, custom PPO, SB3 via a shim) gets thousands of
lockstep envs at device speed through the standard API.

Autoreset follows gymnasium >= 1.0 NEXT_STEP semantics: a terminated env
returns its final obs on the terminating step, then resets on the NEXT step
(action ignored, reward 0, terminated/truncated False, info masked out).

Episode construction (waypoint chain, quadratic path fit, arc table,
obstacle rejection sampling) costs ~100x a physics step, so — exactly like
the training rollout (env.step_autoreset_template) — resets select from a
precomputed template batch that is refreshed every `template_refresh_steps`
host steps (default 128).  Envs resetting within one window restart the
same fresh geometry; the reference redraws per reset, but at the default
window the episode-distribution difference is statistically negligible
(docs/RESULTS.md).  Set `template_refresh_steps=0` to rebuild templates on
every step that needs a reset (exact per-reset redraw semantics, at the
construction cost above).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from drone2d_tpu.config import EnvConfig
from drone2d_tpu.env.env import ACT_DIM, OBS_DIM, Drone2DEnv


def _resolve_config(scenario: Optional[str], overrides: dict) -> EnvConfig:
    """Shared scenario->EnvConfig resolution (same rule as compat.make)."""
    if scenario is not None:
        from drone2d_tpu.eval.run import scenario_config

        cfg = scenario_config(scenario)
        overrides = {**dict(mode=cfg.mode, scenario=cfg.scenario), **overrides}
    return EnvConfig(**overrides)


class Drone2dVectorEnv:
    """`gymnasium.vector.VectorEnv`-conformant batched env (one device program
    per step).  Constructed directly or via
    `gymnasium.make_vec("drone2d_tpu/<scenario>-v0", num_envs=N)` after
    `register_gym_envs()`.

    `global_step` drives the curriculum clock (reference recovers it from
    checkpoint filenames, drone_2d_env.py:79-86; here it is an explicit
    attribute an external training loop advances: `env.global_step = n`).
    """

    render_mode = None
    closed = False
    spec = None  # assigned by gymnasium.make_vec

    @property
    def unwrapped(self):
        return self

    def __init__(
        self,
        num_envs: int = 1024,
        seed: int = 0,
        global_step: int = 0,
        scenario: Optional[str] = None,
        template_refresh_steps: int = 128,
        **config_overrides,
    ):
        import gymnasium

        from gymnasium.vector.utils import batch_space

        self.cfg = _resolve_config(scenario, config_overrides)
        self._env = Drone2DEnv(self.cfg)
        self.num_envs = int(num_envs)
        self.global_step = int(global_step)
        self._refresh = int(template_refresh_steps)

        self.metadata = {
            "render_modes": [],
            "autoreset_mode": gymnasium.vector.AutoresetMode.NEXT_STEP,
        }
        # honest unbounded obs bounds (see register_gym_envs: several dims
        # are normalized, not clipped)
        self.single_observation_space = gymnasium.spaces.Box(
            -np.inf, np.inf, (OBS_DIM,), np.float32
        )
        self.single_action_space = gymnasium.spaces.Box(
            -1.0, 1.0, (ACT_DIM,), np.float32
        )
        self.observation_space = batch_space(
            self.single_observation_space, self.num_envs
        )
        self.action_space = batch_space(self.single_action_space, self.num_envs)

        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._prev_done = None
        self._templates = None
        self._steps_since_refresh = 0

        env = self._env
        n = self.num_envs

        def device_reset(key, gs):
            return env.reset_batch(key, n, gs)

        def device_step(state, prev_done, action, reset_state, reset_obs):
            # one env: plain step, then NEXT_STEP autoreset — an env flagged
            # done on the PREVIOUS step is replaced by its reset template
            # (this step's action/transition discarded, reward 0, not done)
            def one(s, a, pd, rs, ro):
                out = env.step(s, jnp.clip(a, -1.0, 1.0))
                st = jax.tree.map(lambda x, y: jnp.where(pd, y, x), out.state, rs)
                obs = jnp.where(pd, ro, out.obs)
                reward = jnp.where(pd, 0.0, out.reward)
                done = jnp.where(pd, False, out.done)
                # terminated = real MDP end (env `terminal` info flag);
                # truncated = only the step cap fired (cf. step_gymnasium)
                terminated = done & out.info["terminal"].astype(bool)
                truncated = done & ~terminated
                return st, obs, reward, terminated, truncated, out.info

            return jax.vmap(one)(state, action, prev_done, reset_state, reset_obs)

        self._device_reset = jax.jit(device_reset)
        self._device_step = jax.jit(device_step)

    # -- gymnasium.vector.VectorEnv surface -----------------------------------

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        gs = jnp.asarray(self.global_step, jnp.float32)
        self._state, obs = self._device_reset(k, gs)
        self._prev_done = jnp.zeros((self.num_envs,), bool)
        self._templates = None
        self._steps_since_refresh = 0
        return np.asarray(obs), {}

    def step(self, actions):
        if self._state is None:
            raise RuntimeError("call reset() before step()")
        stale = (
            self._templates is None
            or (self._refresh > 0 and self._steps_since_refresh >= self._refresh)
            or (self._refresh == 0 and bool(np.asarray(self._prev_done).any()))
        )
        if stale:
            self._key, k = jax.random.split(self._key)
            gs = jnp.asarray(self.global_step, jnp.float32)
            self._templates = self._device_reset(k, gs)
            self._steps_since_refresh = 0
        self._steps_since_refresh += 1

        a = jnp.asarray(np.asarray(actions, np.float32))
        reset_state, reset_obs = self._templates
        state, obs, reward, terminated, truncated, info = self._device_step(
            self._state, self._prev_done, a, reset_state, reset_obs
        )
        self._state = state
        was_reset = np.asarray(self._prev_done)
        self._prev_done = terminated | truncated

        # gymnasium vector-info convention: arrays + per-key `_mask`; reset
        # steps carry no info (their transition was discarded)
        infos = {k: np.asarray(v) for k, v in info.items()}
        live = ~was_reset
        infos.update({f"_{k}": live for k in info})
        return (
            np.asarray(obs),
            np.asarray(reward),
            np.asarray(terminated),
            np.asarray(truncated),
            infos,
        )

    def close(self, **kwargs) -> None:
        self.closed = True

    def __repr__(self) -> str:
        return f"Drone2dVectorEnv(num_envs={self.num_envs}, scenario={self.cfg.scenario!r})"
