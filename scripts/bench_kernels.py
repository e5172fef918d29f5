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

from drone2d_tpu.utils.runtime import setup_runtime

_EPS = 1e-9


def main() -> None:
    setup_runtime()
    import jax
    import jax.numpy as jnp
    import numpy as np

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    rng = np.random.default_rng(0)
    table_xy = jnp.asarray(rng.uniform(0, 1300, (B, T, 2)), jnp.float32)
    table_u0 = jnp.full((B,), -10.0, jnp.float32)
    du = jnp.full((B,), 2.2, jnp.float32)
    pos = jnp.asarray(rng.uniform(0, 1300, (B, 2)), jnp.float32)

    @jax.jit
    def closest(pos):
        d = table_xy - pos[:, None, :]
        d2 = jnp.sum(d * d, axis=-1)
        idx = jnp.argmin(d2, axis=1)
        take = lambda i: jnp.take_along_axis(d2, i[:, None], axis=1)[:, 0]
        f0 = take(idx)
        fa = take(jnp.maximum(idx - 1, 0))
        fb = take(jnp.minimum(idx + 1, T - 1))
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
