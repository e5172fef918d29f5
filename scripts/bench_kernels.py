"""Micro-benchmark: the batched closest-point table scan on real TPU.

    python scripts/bench_kernels.py [B] [TABLE_N]

History (docs/RESULTS.md "Kernel experiments"): a hand-written pallas kernel
for this op was benchmarked against XLA twice (round 1: 32.7 vs 26.9 us;
round 2 with a lane-roll variant: 42.1/57.4 vs 34.3 us) and lost both times
— XLA's fused subtract-square-reduce is already optimal and the kernel's
one-hot neighbor extraction adds VPU passes (lane rolls were worse still).
Per that negative result the pallas path was retired; this script times the
production jnp path (the exact math of `ops/path.closest_u`'s
fine_points=0 table refine) so future regressions are visible.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from drone2d_tpu.utils.runtime import setup_runtime, wait_for_accelerator

_EPS = 1e-9


def main() -> None:
    setup_runtime()
    if not wait_for_accelerator():
        raise SystemExit("accelerator backend unavailable; aborting bench")
    import jax
    import jax.numpy as jnp
    import numpy as np

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    rng = np.random.default_rng(0)
    # structure-of-arrays table + one-hot refine, mirroring the production
    # ops/path.closest_u (AoS (T, 2) tables and batched 1-element gathers
    # were both measured pathological on TPU; see docs/RESULTS.md)
    table_x = jnp.asarray(rng.uniform(0, 1300, (B, T)), jnp.float32)
    table_y = jnp.asarray(rng.uniform(0, 1300, (B, T)), jnp.float32)
    table_u0 = jnp.full((B,), -10.0, jnp.float32)
    du = jnp.full((B,), 2.2, jnp.float32)
    pos = jnp.asarray(rng.uniform(0, 1300, (B, 2)), jnp.float32)

    @jax.jit
    def closest(pos):
        dx = table_x - pos[:, 0:1]
        dy = table_y - pos[:, 1:2]
        d2 = dx * dx + dy * dy
        idx = jnp.argmin(d2, axis=1)
        onehot = jnp.arange(T)[None, :] == idx[:, None]
        pick = lambda a: jnp.sum(jnp.where(onehot, a, 0.0), axis=1)
        f0 = pick(d2)
        fa = pick(jnp.concatenate([d2[:, :1], d2[:, :-1]], axis=1))
        fb = pick(jnp.concatenate([d2[:, 1:], d2[:, -1:]], axis=1))
        denom = fa - 2.0 * f0 + fb
        off = jnp.where(jnp.abs(denom) < _EPS, 0.0, 0.5 * du * (fa - fb) / denom)
        off = jnp.clip(off, -du, du)
        u0 = table_u0 + idx.astype(jnp.float32) * du
        boundary = (idx == 0) | (idx == T - 1)
        return jnp.where(boundary, u0, u0 + off)

    out = closest(pos)
    float(np.asarray(jax.device_get(out))[0])
    iters = 200
    t0 = time.perf_counter()
    for _ in range(iters):
        out = closest(pos)
    float(np.asarray(jax.device_get(out))[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"xla closest-point: {dt*1e6:8.1f} us/call  ({B} envs x {T} table)")


if __name__ == "__main__":
    main()
