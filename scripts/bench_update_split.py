"""Split-time the quality-recipe PPO update: rollout vs GAE+SGD.

    python scripts/bench_update_split.py [NUM_ENVS] [N_STEPS] [MINIBATCHES]

Times (on the current backend):
  1. the rollout alone (scan of env step + policy sample),
  2. the full update (rollout + GAE + n_epochs x minibatch SGD),
and infers the optimizer-phase share — the measurement behind the
update-path throughput analysis in docs/RESULTS.md (VERDICT r1 next #2).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from drone2d_tpu.utils.runtime import setup_runtime, wait_for_accelerator


def main() -> None:
    setup_runtime()
    if not wait_for_accelerator():
        raise SystemExit("accelerator backend unavailable; aborting bench")
    import jax

    from drone2d_tpu.config import EnvConfig, PPOConfig
    from drone2d_tpu.learn.ppo import PPOLearner

    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    num_mb = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    learner = PPOLearner(
        EnvConfig(),
        PPOConfig(n_steps=n_steps, num_minibatches=num_mb, n_epochs=10),
        num_envs,
    )
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    steps_per_update = num_envs * n_steps

    rollout = jax.jit(lambda s: learner.rollout(s))
    update = learner.update_jit

    import numpy as np

    def timed(f, s, iters=5):
        # device_get a scalar leaf: forces the dispatch queue to drain (a
        # bare block_until_ready has been observed returning early on the
        # remote axon backend)
        sync = lambda o: np.asarray(
            jax.device_get(jax.tree.leaves(o)[0])
        ).ravel()[0]
        sync(f(s))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = f(s)
        sync(out)
        return (time.perf_counter() - t0) / iters

    t_roll = timed(lambda s: rollout(s)[0], state)
    t_upd = timed(lambda s: update(s)[0], state)
    sgd = t_upd - t_roll
    print(f"config: {num_envs} envs x {n_steps} steps, {num_mb} mb x 10 epochs "
          f"({num_mb * 10} SGD steps/update)")
    print(f"rollout:      {t_roll*1e3:8.2f} ms/update "
          f"({steps_per_update / t_roll / 1e3:,.0f}k env-steps/s)")
    print(f"full update:  {t_upd*1e3:8.2f} ms/update "
          f"({steps_per_update / t_upd / 1e3:,.0f}k env-steps/s)")
    print(f"gae+sgd share: {sgd*1e3:8.2f} ms/update ({100*sgd/t_upd:.0f}%)  "
          f"~{sgd / (num_mb * 10) * 1e6:.0f} us per SGD minibatch step")


if __name__ == "__main__":
    main()
