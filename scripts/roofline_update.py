"""Update-phase roofline (VERDICT r4 stretch #7): decompose the SGD phase of
the quality-recipe PPO update the way scripts/roofline_probe.py decomposed
the env hot loop, and compare each piece to its analytic floor.

The quality recipe runs 64 minibatches x 10 epochs = 640 SGD steps per
131072-env-step update; bench_update_split.py showed the full update at
~3.98M steps/s against the 16.9M rollout bound, i.e. the SGD phase is ~75%
of update wall time.  This tool answers WHERE those microseconds go:

  - GAE (one scan over the rollout),
  - the per-epoch timeperm permutation + reshape (10x),
  - the clipped-surrogate value_and_grad on one (B/64)-row minibatch (640x),
  - the Adam update + apply on the 4.7k/37k-param pytree (640x),

each timed standalone under jit, then held against the measured end-to-end
phase (closure = dispatch/serialization XLA can't elide between dependent
SGD steps) and against analytic compute/byte floors for the MLP.

    python scripts/roofline_update.py [NUM_ENVS] [N_STEPS] [MINIBATCHES]

Writes artifacts/campaigns/r5/roofline_update.json when --out is given.
"""

from __future__ import annotations

import json
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
    import jax.numpy as jnp
    import numpy as np

    from drone2d_tpu.config import EnvConfig, PPOConfig
    from drone2d_tpu.learn.ppo import PPOLearner, compute_gae

    argv, args, out = sys.argv[1:], [], None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
        elif a == "--out":          # both --out PATH and --out=PATH work
            i += 1
            out = argv[i] if i < len(argv) else None
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    num_envs = int(args[0]) if len(args) > 0 else 1024
    n_steps = int(args[1]) if len(args) > 1 else 128
    num_mb = int(args[2]) if len(args) > 2 else 64
    hidden = (128, 128)  # flagship capacity (presets)

    ppo_cfg = PPOConfig(
        n_steps=n_steps, num_minibatches=num_mb, n_epochs=10,
        shuffle="timeperm", hidden_sizes=hidden,
    )
    learner = PPOLearner(EnvConfig(), ppo_cfg, num_envs)
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    B = num_envs * n_steps
    mbs = B // num_mb
    n_sgd = num_mb * ppo_cfg.n_epochs

    def timed(f, *xs, iters=20):
        sync = lambda o: np.asarray(
            jax.device_get(jax.tree.leaves(o)[0])
        ).ravel()[0]
        sync(f(*xs))
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = f(*xs)
        sync(o)
        return (time.perf_counter() - t0) / iters

    # --- end-to-end phase split (as bench_update_split.py) ---
    rollout_j = jax.jit(lambda s: learner.rollout(s))
    t_roll = timed(lambda s: rollout_j(s)[0], state, iters=5)
    t_upd = timed(lambda s: learner.update_jit(s)[0], state, iters=5)
    t_phase = t_upd - t_roll

    # --- components, standalone ---
    key = jax.random.PRNGKey(1)
    rewards = jax.random.normal(key, (n_steps, num_envs))
    values = jax.random.normal(key, (n_steps, num_envs))
    dones = jnp.zeros((n_steps, num_envs), bool)
    last_vals = jnp.zeros((num_envs,))
    gae_j = jax.jit(lambda r, v, d, l: compute_gae(
        r, v, d, l, gamma=ppo_cfg.gamma, gae_lambda=ppo_cfg.gae_lambda))
    t_gae = timed(gae_j, rewards, values, dones, last_vals)

    stacked = (
        jax.random.normal(key, (n_steps, num_envs, 27)),
        jax.random.normal(key, (n_steps, num_envs, 2)),
        jax.random.normal(key, (n_steps, num_envs)),
        jax.random.normal(key, (n_steps, num_envs)),
        jax.random.normal(key, (n_steps, num_envs)),
    )

    def perm_epoch(stk, k):
        perm = jax.random.permutation(k, n_steps)
        return jax.tree.map(
            lambda x: x[perm].reshape((num_mb, mbs) + x.shape[2:]), stk
        )

    perm_j = jax.jit(perm_epoch)
    t_perm = timed(perm_j, stacked, key)

    mb = (
        jax.random.normal(key, (mbs, 27)),
        jax.random.normal(key, (mbs, 2)),
        jax.random.normal(key, (mbs,)),
        jax.random.normal(key, (mbs,)),
        jax.random.normal(key, (mbs,)),
    )
    grad_j = jax.jit(
        lambda p, *xs: jax.value_and_grad(learner.loss_fn, has_aux=True)(p, *xs)
    )
    t_grad = timed(grad_j, state.params, *mb)
    (_, _), grads = grad_j(state.params, *mb)

    import optax

    def opt_step(p, o, g):
        upd, o2 = learner.tx.update(g, o, p)
        return optax.apply_updates(p, upd), o2

    opt_j = jax.jit(opt_step)
    t_opt = timed(opt_j, state.params, state.opt_state, grads)

    # --- analytic floors for the grad step ---
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(state.params))
    dims = [27, *hidden]
    mm_flops_fwd = 2 * sum(a * b for a, b in zip(dims[:-1], dims[1:]))
    mm_flops_fwd += 2 * (hidden[-1] * 3)  # pi(2)+vf(1) heads
    mm_flops_fwd *= 2  # separate pi and vf towers
    flops_step = 3 * mm_flops_fwd * mbs  # fwd + ~2x bwd
    # bytes: minibatch activations r/w (~3 layers) + params + adam moments
    bytes_step = mbs * 27 * 4 * 3 + n_params * 4 * 8
    PEAK_FLOPS = 4.9e13   # v5e-lite fp32-on-MXU ballpark (half bf16 197/4)
    PEAK_BW = 8.1e11      # v5e HBM GB/s
    floor_compute = flops_step / PEAK_FLOPS
    floor_bytes = bytes_step / PEAK_BW

    sum_components = (
        t_gae + ppo_cfg.n_epochs * t_perm + n_sgd * (t_grad + t_opt)
    )
    report = dict(
        config=dict(num_envs=num_envs, n_steps=n_steps, num_minibatches=num_mb,
                    n_epochs=ppo_cfg.n_epochs, minibatch_rows=mbs,
                    hidden=list(hidden), n_params=n_params),
        ms=dict(
            rollout=t_roll * 1e3, full_update=t_upd * 1e3,
            sgd_phase=t_phase * 1e3, gae=t_gae * 1e3,
            perm_per_epoch=t_perm * 1e3,
            grad_per_step=t_grad * 1e3, opt_per_step=t_opt * 1e3,
            components_sum=sum_components * 1e3,
        ),
        env_steps_per_s=dict(
            rollout=B / t_roll, full_update=B / t_upd,
        ),
        floors_us=dict(
            grad_compute=floor_compute * 1e6, grad_bytes=floor_bytes * 1e6,
        ),
        shares=dict(
            sgd_of_update=t_phase / t_upd,
            grad_of_sgd=n_sgd * t_grad / max(t_phase, 1e-12),
            opt_of_sgd=n_sgd * t_opt / max(t_phase, 1e-12),
            perm_of_sgd=ppo_cfg.n_epochs * t_perm / max(t_phase, 1e-12),
            gae_of_sgd=t_gae / max(t_phase, 1e-12),
            unexplained=(t_phase - sum_components) / max(t_phase, 1e-12),
        ),
    )
    print(json.dumps(report, indent=1))
    if out:
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
