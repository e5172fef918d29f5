"""Headline benchmark: env-steps/s at 4096 parallel envs on one chip.

Measures the full training-relevant hot loop — policy sampling + physics +
observation (path closest-point search, k-nearest obstacles) + reward +
masked auto-reset — scanned over time and vmapped over 4096 envs, the
TPU-native replacement for the reference's SubprocVecEnv process farm
(reference main.py:183-190; BASELINE.md target: >=1e6 env-steps/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from drone2d_tpu.config import EnvConfig, PPOConfig
from drone2d_tpu.learn.ppo import PPOLearner
from drone2d_tpu.models.policy import sample_action

NUM_ENVS = 4096
CHUNK_T = 256          # steps per timed device program
REPEATS = 8
BASELINE = 1_000_000.0  # env-steps/s target (BASELINE.json)


def main() -> None:
    from drone2d_tpu.utils.runtime import setup_runtime

    setup_runtime()
    env_cfg = EnvConfig()
    learner = PPOLearner(env_cfg, PPOConfig(), NUM_ENVS)
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))

    def chunk(env_state, obs, rng):
        # per-chunk reset templates, as in the real training rollout
        rng, k_template = jax.random.split(rng)
        reset_state, reset_obs = learner.env.reset_batch(k_template, NUM_ENVS, 0)

        def step_fn(carry, _):
            env_state, obs, rng = carry
            rng, k_act = jax.random.split(rng)
            action, _, _ = sample_action(state.params, obs, k_act)
            out = learner.env.step_batch_template(
                env_state, jnp.clip(action, -1.0, 1.0), reset_state, reset_obs
            )
            return (out.state, out.obs, rng), out.reward

        (env_state, obs, rng), rewards = jax.lax.scan(
            step_fn, (env_state, obs, rng), None, length=CHUNK_T
        )
        return env_state, obs, rng, jnp.sum(rewards)

    fn = jax.jit(chunk)
    env_state, obs, rng = state.env_state, state.obs, state.rng

    # warmup / compile
    env_state, obs, rng, r = fn(env_state, obs, rng)
    jax.block_until_ready(r)

    t0 = time.perf_counter()
    for _ in range(REPEATS):
        env_state, obs, rng, r = fn(env_state, obs, rng)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0

    steps = REPEATS * CHUNK_T * NUM_ENVS
    rate = steps / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s",
                "value": round(rate, 1),
                "unit": "steps/s",
                "vs_baseline": round(rate / BASELINE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
