"""TPU bench: fused pallas policy kernel vs the XLA-compiled production path.

Times `models.policy.sample_action` (XLA fusions) against
`ops.pallas_policy.fused_sample_action` on the bench shape (4096 envs,
hidden 128x128), each under a 256-iteration lax.scan with the obs fed back
through a cheap dependency so the compiler can't hoist anything.

    python scripts/bench_fused_policy.py [--batch 4096] [--iters 256]
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
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--iters", type=int, default=256)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--block", type=int, default=256)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from drone2d_tpu.utils.runtime import setup_runtime, wait_for_accelerator

    setup_runtime()
    if not wait_for_accelerator():
        sys.exit("accelerator backend unavailable; aborting")
    import jax
    import jax.numpy as jnp

    from drone2d_tpu.models.policy import init_actor_critic, sample_action
    from drone2d_tpu.ops.pallas_policy import fused_sample_action

    key = jax.random.PRNGKey(0)
    params = init_actor_critic(key, 27, 2, hidden=(128, 128))
    obs0 = jax.random.normal(jax.random.fold_in(key, 1),
                             (args.batch, 27), jnp.float32)

    def xla_loop(obs0):
        def body(carry, _):
            obs, k = carry
            k, sub = jax.random.split(k)
            a, logp, v = sample_action(params, obs, sub)
            # cheap dependency: rotate obs by the action stats
            obs = obs + 1e-6 * (logp[:, None] + v[:, None] + a.sum(-1, keepdims=True))
            return (obs, k), ()
        (obs, _), _ = jax.lax.scan(body, (obs0, key), None, length=args.iters)
        return obs

    def pallas_loop(obs0):
        def body(carry, _):
            obs, k = carry
            k, sub = jax.random.split(k)
            noise = jax.random.normal(sub, (args.batch, 2), jnp.float32)
            a, logp, v = fused_sample_action(params, obs, noise,
                                             block=args.block)
            obs = obs + 1e-6 * (logp[:, None] + v[:, None] + a.sum(-1, keepdims=True))
            return (obs, k), ()
        (obs, _), _ = jax.lax.scan(body, (obs0, key), None, length=args.iters)
        return obs

    results = {}
    for name, fn in (("xla", xla_loop), ("pallas", pallas_loop)):
        jfn = jax.jit(fn)
        jax.block_until_ready(jfn(obs0))  # compile
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(jfn(obs0))
            times.append(time.perf_counter() - t0)
        best = min(times)
        ns = best / args.iters / args.batch * 1e9
        results[name] = dict(best_s=best, ns_per_env_sample=round(ns, 2))
        print(f"{name}: {best*1e3:.2f} ms for {args.iters} iters "
              f"-> {ns:.2f} ns/env-sample", flush=True)

    results["speedup_xla_over_pallas"] = round(
        results["pallas"]["best_s"] / results["xla"]["best_s"], 3)
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(batch=args.batch, iters=args.iters,
                           block=args.block, **results), f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
