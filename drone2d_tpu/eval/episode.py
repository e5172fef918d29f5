"""Vectorized full-episode evaluation rollouts.

The reference evaluates sequentially — one env, `run_n_times` episodes, a
Python while-loop harvesting the info dict at each done (`main.py:259-286`).
Here all N episodes run AT ONCE: vmap over episodes, `lax.scan` over the
episode cap, with a done-latch so finished episodes coast (their metrics are
frozen at the first done).  A 100-episode campaign is one device program.

Trajectories are recorded on-device as a fixed (T, 2) position array per
episode plus the live length — the host converts them to the reference's
screen-coordinate flight_path lists (drone_2d_env.py:984-986).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from drone2d_tpu.config import EnvConfig
from drone2d_tpu.env.env import Drone2DEnv
from drone2d_tpu.models.policy import ActorCriticParams, policy_value


class EpisodeResults(NamedTuple):
    """Per-episode campaign results (leading dim = episode)."""

    success: np.ndarray       # (N,) bool
    fail: np.ndarray          # (N,) bool
    collision: np.ndarray     # (N,) int  (1 if ended by collision)
    ape: np.ndarray           # (N,) mean distance from path
    time_steps: np.ndarray    # (N,) episode length
    total_reward: np.ndarray  # (N,) return
    traj: np.ndarray          # (N, T, 2) world positions (frozen after done)
    angles: np.ndarray        # (N, T) body angles (for drone replay)
    traj_len: np.ndarray      # (N,) live steps in traj

    def flight_paths(self, screen_h: float):
        """Reference flight_path format: [(x, screen_h - y), ...] per episode
        (drone_2d_env.py:986)."""
        out = []
        for i in range(self.traj.shape[0]):
            n = int(self.traj_len[i])
            out.append(
                [(float(x), float(screen_h - y)) for x, y in self.traj[i, :n]]
            )
        return out


def _episode_runner(
    cfg: EnvConfig,
    random_policy: bool,
    deterministic: bool,
    global_step: int,
):
    """Build `one_episode(params, ep_key) -> (metrics, traj, angles, len)` for
    the given env config.  Kept param-explicit (params is an argument, not a
    closure) so callers can vmap over an agent axis as well as the episode
    axis — batched multi-agent evaluation is one device program."""
    env = Drone2DEnv(cfg)
    T = cfg.n_steps

    def one_episode(params, ep_key):
        k_reset, k_policy = jax.random.split(ep_key)
        state, obs = env.reset(k_reset, global_step)

        def step_fn(carry, k):
            state, obs, done, metrics = carry
            if random_policy:
                action = jax.random.uniform(k, (2,), minval=-1.0, maxval=1.0)
            elif deterministic:
                mean, _, _ = policy_value(params, obs)
                action = jnp.clip(mean, -1.0, 1.0)
            else:
                mean, log_std, _ = policy_value(params, obs)
                noise = jax.random.normal(k, mean.shape)
                action = jnp.clip(mean + jnp.exp(log_std) * noise, -1.0, 1.0)
            out = env.step(state, action)
            first_done = out.done & ~done
            # NB: an episode whose reach-end (end2) and step-cap (end4) fire
            # on the same step latches BOTH success and fail — deliberate
            # reference parity: its independent `if end_cond_*` blocks set
            # n_successful_runs and n_failed_runs the same way
            # (drone_2d_env.py:596-610), and its test harness sums both
            new_metrics = dict(
                success=metrics["success"] | (first_done & (out.info["n_successful_runs"] == 1)),
                fail=metrics["fail"] | (first_done & (out.info["n_failed_runs"] == 1)),
                collision=metrics["collision"] + jnp.where(first_done, out.info["n_collisions"], 0),
                ape=jnp.where(first_done, out.info["APE"], metrics["ape"]),
                time_steps=jnp.where(first_done, out.info["env_steps"], metrics["time_steps"]),
                total_reward=jnp.where(first_done, out.info["total_reward"], metrics["total_reward"]),
            )
            # freeze state once done (coast); record position pre-freeze
            new_state = jax.tree.map(
                lambda a, b: jnp.where(done, a, b), state, out.state
            )
            new_obs = jnp.where(done, obs, out.obs)
            pos = new_state.body.pos
            return (
                (new_state, new_obs, done | out.done, new_metrics),
                (pos, new_state.body.angle, ~done),
            )

        zero = dict(
            success=jnp.asarray(False), fail=jnp.asarray(False),
            collision=jnp.int32(0), ape=jnp.float32(0.0),
            time_steps=jnp.int32(0), total_reward=jnp.float32(0.0),
        )
        keys = jax.random.split(k_policy, T)
        (state, obs, done, metrics), (traj, angles, live) = jax.lax.scan(
            step_fn, (state, obs, jnp.asarray(False), zero), keys
        )
        # episode hit the cap without a terminal: report as a timeout fail
        timeout = ~done
        metrics["fail"] = metrics["fail"] | timeout
        metrics["ape"] = jnp.where(timeout, state.path_error / T, metrics["ape"])
        metrics["time_steps"] = jnp.where(timeout, T, metrics["time_steps"])
        metrics["total_reward"] = jnp.where(timeout, state.total_reward, metrics["total_reward"])
        return metrics, traj, angles, jnp.sum(live.astype(jnp.int32))

    return one_episode


def _to_results(metrics, traj, angles, traj_len) -> EpisodeResults:
    g = jax.device_get
    return EpisodeResults(
        success=np.asarray(g(metrics["success"])),
        fail=np.asarray(g(metrics["fail"])),
        collision=np.asarray(g(metrics["collision"])),
        ape=np.asarray(g(metrics["ape"])),
        time_steps=np.asarray(g(metrics["time_steps"])),
        total_reward=np.asarray(g(metrics["total_reward"])),
        traj=np.asarray(g(traj)),
        angles=np.asarray(g(angles)),
        traj_len=np.asarray(g(traj_len)),
    )


def run_episodes(
    cfg: EnvConfig,
    params: Optional[ActorCriticParams],
    key: jax.Array,
    n_episodes: int,
    *,
    deterministic: bool = False,
    global_step: int = 0,
) -> EpisodeResults:
    """Run n_episodes complete episodes under the policy (or random actions
    when params is None).  `deterministic=False` matches the reference's
    `model.predict(obs)` (SB3 default samples the Gaussian, main.py:263)."""
    one_episode = _episode_runner(cfg, params is None, deterministic, global_step)
    if params is None:
        # dummy pytree so vmap in_axes=None has something to pass through
        params = jnp.zeros(())
    keys = jax.random.split(key, n_episodes)
    metrics, traj, angles, traj_len = jax.jit(
        jax.vmap(one_episode, in_axes=(None, 0))
    )(params, keys)
    return _to_results(metrics, traj, angles, traj_len)


def run_episodes_multi(
    cfg: EnvConfig,
    params_stack: ActorCriticParams,
    key: jax.Array,
    n_episodes: int,
    *,
    deterministic: bool = False,
    global_step: int = 0,
    same_episodes: bool = True,
) -> EpisodeResults:
    """Evaluate a whole STACK of agents at once: `params_stack` is an
    ActorCriticParams pytree with a leading agent axis A (e.g. several seeds'
    checkpoints stacked with `jax.tree.map(lambda *x: jnp.stack(x), ...)`).

    All A x n_episodes rollouts run as ONE device program — this is the
    TPU-native answer to the reference's one-at-a-time Tests/ campaign loop
    (main.py:242-400) and makes checkpoint selection nearly free: 48 agents x
    100 episodes is a single vmap x vmap launch.

    `same_episodes=True` gives every agent the identical episode keys (same
    spawn/path/obstacle draws AND the same policy-noise streams), so
    per-agent numbers are directly comparable (paired comparison); False
    draws independent episodes per agent.  Returned arrays have leading shape
    (A, n_episodes).
    """
    one_episode = _episode_runner(cfg, False, deterministic, global_step)
    A = jax.tree.leaves(params_stack)[0].shape[0]
    if same_episodes:
        keys = jax.random.split(key, n_episodes)
        fn = jax.vmap(
            jax.vmap(one_episode, in_axes=(None, 0)), in_axes=(0, None)
        )
    else:
        keys = jax.random.split(key, A * n_episodes)
        keys = keys.reshape((A, n_episodes) + keys.shape[1:])
        fn = jax.vmap(jax.vmap(one_episode, in_axes=(None, 0)), in_axes=(0, 0))
    metrics, traj, angles, traj_len = jax.jit(fn)(params_stack, keys)
    return _to_results(metrics, traj, angles, traj_len)


def campaign_keys(seed: int, scenario: str, n_chunks: int):
    """The committed campaign-RNG scheme shared by every precision tool
    (scripts/{precision_campaign,stage1_failure_modes,stage1_time_margin}.py):
    chunk c of a scenario's campaign uses

        fold_in(fold_in(PRNGKey(seed), crc32(scenario) % 2**30), c)

    The crc32 scenario tag keeps streams disjoint across scenarios at the
    same seed and is stable across processes (unlike hash()).  Campaigns
    are reproducible and extendable: more chunks = more episodes, never
    reusing a key.  All artifacts under artifacts/campaigns/r4/ produced
    by precision_campaign.py used exactly this scheme."""
    import zlib

    tag = zlib.crc32(scenario.encode()) % (1 << 30)
    base = jax.random.fold_in(jax.random.PRNGKey(seed), tag)
    return [jax.random.fold_in(base, c) for c in range(n_chunks)]
