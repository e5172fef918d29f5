"""Micro-benchmark: pallas vs XLA closest-point table kernel on real TPU.

    python scripts/bench_kernels.py [B] [TABLE_N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from drone2d_tpu.utils.runtime import setup_runtime


def main() -> None:
    setup_runtime()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from drone2d_tpu.ops.pallas_path import closest_u_table_batch

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    rng = np.random.default_rng(0)
    table_xy = jnp.asarray(rng.uniform(0, 1300, (B, T, 2)), jnp.float32)
    table_u0 = jnp.full((B,), -10.0, jnp.float32)
    du = jnp.full((B,), 2.2, jnp.float32)
    pos = jnp.asarray(rng.uniform(0, 1300, (B, 2)), jnp.float32)

    for use_pallas in (False, True):
        f = lambda p: closest_u_table_batch(
            table_xy, table_u0, du, p, use_pallas=use_pallas
        )
        out = f(pos)
        jax.block_until_ready(out)
        iters = 200
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(pos)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        name = "pallas" if use_pallas else "xla"
        print(f"{name}: {dt*1e6:8.1f} us/call  ({B} envs x {T} table)")


if __name__ == "__main__":
    main()
