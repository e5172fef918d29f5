"""Roofline measurements for the env hot loop (VERDICT r3 #6).

Times the bench chunk (scan of policy-sample + env step + masked auto-reset)
across a grid of (num_envs, path_table_n) to attribute the per-env-step cost
to its candidate bottlenecks:

* num_envs scaling separates latency/dispatch-bound (flat time vs batch)
  from throughput-bound (time ~ linear in batch);
* path_table_n scaling isolates the closest-point table stream — the
  biggest per-env byte stream in the step (table_u/x/y: 12 B per entry per
  pass) — from everything else;
* an optional carry-stream probe (--no-reset) drops the auto-reset select
  to measure how much of the cost is the full-carry read+write the reset
  where() forces on the episode-constant geometry leaves.

    python scripts/roofline_probe.py [--out results/roofline.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="results/roofline.json")
    p.add_argument("--chunk", type=int, default=256)
    p.add_argument("--repeats", type=int, default=6)
    args = p.parse_args()

    from drone2d_tpu.utils.runtime import setup_runtime, wait_for_accelerator

    setup_runtime()
    if not wait_for_accelerator():
        raise SystemExit("accelerator backend unavailable")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from drone2d_tpu.config import EnvConfig
    from drone2d_tpu.env.env import Drone2DEnv
    from drone2d_tpu.models.policy import init_actor_critic, sample_action

    def measure(num_envs: int, table_n: int, *, autoreset: bool = True) -> float:
        """ns per env-step for the bench chunk at this shape."""
        env = Drone2DEnv(EnvConfig(path_table_n=table_n))
        params = init_actor_critic(jax.random.PRNGKey(0), 27, 2)

        def chunk(env_state, obs, rng):
            rng, k_t = jax.random.split(rng)
            reset_state, reset_obs = env.reset_batch(k_t, num_envs, 0)

            def step_fn(carry, _):
                env_state, obs, rng = carry
                rng, k_act = jax.random.split(rng)
                action, _, _ = sample_action(params, obs, k_act)
                a = jnp.clip(action, -1.0, 1.0)
                if autoreset:
                    out = env.step_batch_template(
                        env_state, a, reset_state, reset_obs
                    )
                    return (out.state, out.obs, rng), out.reward
                out = jax.vmap(env.step)(env_state, a)
                return (out.state, out.obs, rng), out.reward

            c, r = jax.lax.scan(step_fn, (env_state, obs, rng), None,
                                length=args.chunk)
            env_state, obs, rng = c
            return env_state, obs, rng, jnp.sum(r)

        fn = jax.jit(chunk)
        env_state, obs = env.reset_batch(jax.random.PRNGKey(1), num_envs, 0)
        rng = jax.random.PRNGKey(2)
        env_state, obs, rng, r = fn(env_state, obs, rng)   # compile
        float(np.asarray(jax.device_get(r)))
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            env_state, obs, rng, r = fn(env_state, obs, rng)
        float(np.asarray(jax.device_get(r)))
        dt = time.perf_counter() - t0
        steps = args.repeats * args.chunk * num_envs
        return dt / steps * 1e9

    rows = []
    print("== num_envs scaling (table_n=512) ==")
    for n in (512, 1024, 2048, 4096, 8192):
        ns = measure(n, 512)
        rows.append(dict(probe="envs", num_envs=n, table_n=512, ns_per_env_step=round(ns, 2)))
        print(f"  envs={n:5d}: {ns:7.2f} ns/env-step  ({1e9/ns/1e6:,.1f}M steps/s)")

    print("== table_n scaling (num_envs=4096) ==")
    for t in (128, 256, 512, 1024, 2048):
        ns = measure(4096, t)
        rows.append(dict(probe="table", num_envs=4096, table_n=t, ns_per_env_step=round(ns, 2)))
        print(f"  table={t:5d}: {ns:7.2f} ns/env-step")

    print("== auto-reset select ablation (4096 envs, table 512) ==")
    for ar in (True, False):
        ns = measure(4096, 512, autoreset=ar)
        rows.append(dict(probe="autoreset", num_envs=4096, table_n=512,
                         autoreset=ar, ns_per_env_step=round(ns, 2)))
        print(f"  autoreset={ar}: {ns:7.2f} ns/env-step")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(dict(chunk=args.chunk, repeats=args.repeats, rows=rows), f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
