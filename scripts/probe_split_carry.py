"""A/B probe: template-carry vs split-carry hot loop on the real chip.

Times the bench chunk (policy sample + env step + auto-reset) both ways at
the headline shape (4096 envs x 256-step scan) and prints ns/env-step for
each plus the speedup.  Also asserts the two loops agree bit-exactly on
the full per-step (T, n) reward arrays (device_get + np.array_equal — the
actual bit-identity claim, not a float reduction; the full pytree check
lives in tests/test_env.py::test_split_carry_bitexact).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from drone2d_tpu.config import EnvConfig, PPOConfig
from drone2d_tpu.env.types import finalize_split, split_state
from drone2d_tpu.learn.ppo import PPOLearner
from drone2d_tpu.models.policy import sample_action


def main() -> None:
    from drone2d_tpu.utils.runtime import setup_runtime, wait_for_accelerator

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--chunk", type=int, default=256)
    p.add_argument("--repeats", type=int, default=8)
    args = p.parse_args()

    setup_runtime()
    if not wait_for_accelerator(retries=2, retry_wait_s=15.0):
        raise SystemExit("accelerator backend unavailable")

    n, T = args.num_envs, args.chunk
    learner = PPOLearner(EnvConfig(), PPOConfig(), n)
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    params = state.params

    def chunk_template(env_state, obs, rng):
        rng, k_template = jax.random.split(rng)
        reset_state, reset_obs = learner.env.reset_batch(k_template, n, 0)

        def step_fn(carry, _):
            env_state, obs, rng = carry
            rng, k_act = jax.random.split(rng)
            action, _, _ = sample_action(params, obs, k_act)
            out = learner.env.step_batch_template(
                env_state, jnp.clip(action, -1.0, 1.0), reset_state, reset_obs
            )
            return (out.state, out.obs, rng), out.reward

        (env_state, obs, rng), rewards = jax.lax.scan(
            step_fn, (env_state, obs, rng), None, length=T
        )
        return env_state, obs, rng, rewards

    def chunk_split(env_state, obs, rng):
        rng, k_template = jax.random.split(rng)
        reset_state, reset_obs = learner.env.reset_batch(k_template, n, 0)
        tmpl_static, tmpl_dyn = split_state(reset_state)
        init_static, dyn = split_state(env_state)
        fresh = jnp.zeros((n,), bool)

        def step_fn(carry, _):
            dyn, fresh, obs, rng = carry
            rng, k_act = jax.random.split(rng)
            action, _, _ = sample_action(params, obs, k_act)
            dyn, fresh, obs, reward, _, _ = learner.env.step_batch_split(
                dyn, fresh, jnp.clip(action, -1.0, 1.0),
                init_static, tmpl_static, tmpl_dyn, reset_obs,
            )
            return (dyn, fresh, obs, rng), reward

        (dyn, fresh, obs, rng), rewards = jax.lax.scan(
            step_fn, (dyn, fresh, obs, rng), None, length=T
        )
        return (
            finalize_split(init_static, tmpl_static, fresh, dyn),
            obs, rng, rewards,
        )

    results = {}
    rewards = {}
    for name, fn in [("template", chunk_template), ("split", chunk_split)]:
        jfn = jax.jit(fn)
        env_state, obs, rng = state.env_state, state.obs, state.rng
        env_state, obs, rng, r = jfn(env_state, obs, rng)  # compile
        # per-step (T, n) reward arrays compared bitwise on host: the actual
        # bit-identity claim, not two separately-compiled f32 reductions
        rewards[name] = np.asarray(jax.device_get(r))
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            env_state, obs, rng, r = jfn(env_state, obs, rng)
        jax.block_until_ready(r)
        dt = time.perf_counter() - t0
        ns = dt / (args.repeats * T * n) * 1e9
        results[name] = ns
        print(f"{name}: {ns:.1f} ns/env-step "
              f"({args.repeats * T * n / dt / 1e6:.2f}M steps/s)")

    print(json.dumps({
        "num_envs": n, "chunk": T,
        "template_ns": round(results["template"], 2),
        "split_ns": round(results["split"], 2),
        "speedup": round(results["template"] / results["split"], 4),
        "first_chunk_reward_equal": bool(
            np.array_equal(rewards["template"], rewards["split"])),
    }))


if __name__ == "__main__":
    main()
