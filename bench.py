"""Headline benchmark: env-steps/s at 4096 parallel envs on one chip.

Measures the full training-relevant hot loop — policy sampling + physics +
observation (path closest-point search, k-nearest obstacles) + reward +
masked auto-reset — scanned over time and vmapped over 4096 envs, the
TPU-native replacement for the reference's SubprocVecEnv process farm
(reference main.py:183-190; BASELINE.md target: >=1e6 env-steps/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`python bench.py --train` instead times the FULL quality-recipe PPO update
(rollout + GAE + 10 epochs x 64 minibatches of SGD at 1024 envs x 128
steps — the docs/RESULTS.md training recipe) and prints one
train_steps_per_s JSON line.  `--all` prints both.
"""

from __future__ import annotations

import argparse
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

# the quality-recipe update shape (docs/RESULTS.md: 1024 envs x 128 steps,
# 64 minibatches x 10 epochs = 640 SGD steps per update).  Default shuffle
# is 'timeperm' — the gather-free mode validated at quality parity in
# docs/RESULTS.md; pass --shuffle exact for the SB3-parity variant.
TRAIN_NUM_ENVS = 1024
TRAIN_PPO = dict(n_steps=128, num_minibatches=64, n_epochs=10)
TRAIN_REPEATS = 5


def bench_train(shuffle: str = "timeperm") -> None:
    """Time the full PPO update (rollout + GAE + minibatch SGD) exactly as
    `train.py` runs it — one jitted program per update, no host logging."""
    learner = PPOLearner(
        EnvConfig(), PPOConfig(**TRAIN_PPO, shuffle=shuffle), TRAIN_NUM_ENVS
    )
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))

    import numpy as np

    # warmup / compile; device_get forces a full round trip (on the remote
    # axon backend a bare block_until_ready has been observed to return
    # before the dispatch queue drains, yielding impossible timings)
    state, metrics = learner.update_jit(state)
    float(np.asarray(jax.device_get(metrics["loss"])))

    t0 = time.perf_counter()
    for _ in range(TRAIN_REPEATS):
        state, metrics = learner.update_jit(state)
    float(np.asarray(jax.device_get(metrics["loss"])))
    dt = time.perf_counter() - t0

    steps = TRAIN_REPEATS * TRAIN_NUM_ENVS * learner.cfg.n_steps
    rate = steps / dt
    print(
        json.dumps(
            {
                "metric": "train_steps_per_s",
                "value": round(rate, 1),
                "unit": "steps/s",
                "vs_baseline": round(rate / BASELINE, 3),
            }
        )
    )


def main() -> None:
    from drone2d_tpu.utils.runtime import setup_runtime, wait_for_accelerator

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train", action="store_true",
                   help="time the full quality-recipe PPO update instead")
    p.add_argument("--shuffle", default="timeperm",
                   choices=["exact", "affine", "timeperm"],
                   help="shuffle mode for --train (default: timeperm, the "
                   "gather-free mode validated at quality parity)")
    p.add_argument("--all", action="store_true", help="print both lines")
    p.add_argument("--num-envs", type=int, default=NUM_ENVS,
                   help="env batch for the hot-loop line (scaling experiments; "
                   "the headline default is 4096)")
    p.add_argument("--chunk", type=int, default=CHUNK_T,
                   help="steps per timed device program (default 256)")
    args = p.parse_args()

    setup_runtime()
    # wedged-backend guard: probe in a subprocess (bounded) so an unreachable
    # TPU tunnel aborts the bench with a message instead of hanging forever
    if not wait_for_accelerator(retries=4, retry_wait_s=30.0):
        raise SystemExit("accelerator backend unavailable; aborting bench")
    if args.train or args.all:
        bench_train(args.shuffle)
        if not args.all:
            return
    num_envs, chunk_t = args.num_envs, args.chunk
    env_cfg = EnvConfig()
    learner = PPOLearner(env_cfg, PPOConfig(), num_envs)
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))

    def chunk(env_state, obs, rng):
        # per-chunk reset templates, as in the real training rollout
        rng, k_template = jax.random.split(rng)
        reset_state, reset_obs = learner.env.reset_batch(k_template, num_envs, 0)

        def step_fn(carry, _):
            env_state, obs, rng = carry
            rng, k_act = jax.random.split(rng)
            action, _, _ = sample_action(state.params, obs, k_act)
            out = learner.env.step_batch_template(
                env_state, jnp.clip(action, -1.0, 1.0), reset_state, reset_obs
            )
            return (out.state, out.obs, rng), out.reward

        (env_state, obs, rng), rewards = jax.lax.scan(
            step_fn, (env_state, obs, rng), None, length=chunk_t
        )
        return env_state, obs, rng, jnp.sum(rewards)

    fn = jax.jit(chunk)
    env_state, obs, rng = state.env_state, state.obs, state.rng

    import numpy as np

    # warmup / compile; device_get forces a full round trip (same rationale
    # as bench_train: on the remote axon backend a bare block_until_ready
    # has been observed to return before the dispatch queue drains)
    env_state, obs, rng, r = fn(env_state, obs, rng)
    float(np.asarray(jax.device_get(r)))

    t0 = time.perf_counter()
    for _ in range(REPEATS):
        env_state, obs, rng, r = fn(env_state, obs, rng)
    float(np.asarray(jax.device_get(r)))
    dt = time.perf_counter() - t0

    steps = REPEATS * chunk_t * num_envs
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
