"""Capture a jax.profiler trace of the env hot loop on the current backend.

    python scripts/profile_step.py [outdir]

Produces a TensorBoard-loadable XPlane trace of a few benchmark chunks
(SURVEY.md §5.1 — the tracing capability the reference lacks).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from drone2d_tpu.utils.runtime import setup_runtime


def main() -> None:
    setup_runtime()
    import jax
    import jax.numpy as jnp

    from drone2d_tpu.config import EnvConfig, PPOConfig
    from drone2d_tpu.learn.ppo import PPOLearner
    from drone2d_tpu.models.policy import sample_action
    from drone2d_tpu.utils.profiling import trace

    out = sys.argv[1] if len(sys.argv) > 1 else "logs/profile"
    NUM_ENVS, T = 4096, 64

    learner = PPOLearner(EnvConfig(), PPOConfig(), NUM_ENVS)
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))

    def chunk(env_state, obs, rng):
        rng, k_t = jax.random.split(rng)
        reset_state, reset_obs = learner.env.reset_batch(k_t, NUM_ENVS, 0)

        def step_fn(carry, _):
            env_state, obs, rng = carry
            rng, k_act = jax.random.split(rng)
            action, _, _ = sample_action(state.params, obs, k_act)
            out = learner.env.step_batch_template(
                env_state, jnp.clip(action, -1.0, 1.0), reset_state, reset_obs
            )
            return (out.state, out.obs, rng), out.reward

        c, r = jax.lax.scan(step_fn, (env_state, obs, rng), None, length=T)
        return c, jnp.sum(r)

    f = jax.jit(chunk)
    c, r = f(state.env_state, state.obs, state.rng)
    jax.block_until_ready(r)

    with trace(out):
        for _ in range(3):
            c, r = f(*c)
        jax.block_until_ready(r)
    print(f"trace written to {out}")


if __name__ == "__main__":
    main()
