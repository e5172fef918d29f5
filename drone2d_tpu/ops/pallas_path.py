"""Pallas TPU kernel for the batched closest-point table search.

The hot loop's single largest data movement is the per-step arc-table
distance scan: for every env, dist^2 against its (TABLE_N, 2) table,
argmin, and a parabolic refine on the winning bracket
(`ops/path.py closest_u`).  XLA already fuses the elementwise+reduce chain
well; this kernel exists to (a) pin the whole scan in VMEM with zero
intermediate HBM traffic, and (b) fuse the argmin with the three one-hot
neighbor extractions that XLA emits as separate reductions.  It is optional
— `closest_u_table_batch(..., use_pallas=False)` is the identical jnp
fallback used on CPU and in interpret-mode tests; enable on TPU via
`EnvConfig` by benchmarking both (scripts/bench_kernels.py).

Layout: envs on sublanes (8 per grid step), table on lanes (TABLE_N a
multiple of 128).  All operands VMEM-resident; outputs are the refined
u* per env for the `fine_points=0` path, or the bracket u0 feeding the
jnp fine-rescan otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-9
_BLOCK_B = 8


def _kernel(tx_ref, ty_ref, px_ref, py_ref, u0_ref, du_ref, out_ref):
    d2 = (tx_ref[:] - px_ref[:]) ** 2 + (ty_ref[:] - py_ref[:]) ** 2  # (8, T)
    T = d2.shape[1]
    idx = jnp.argmin(d2, axis=1, keepdims=True)                        # (8, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    f0 = jnp.sum(jnp.where(cols == idx, d2, 0.0), axis=1, keepdims=True)
    fa = jnp.sum(jnp.where(cols == idx - 1, d2, 0.0), axis=1, keepdims=True)
    fb = jnp.sum(jnp.where(cols == idx + 1, d2, 0.0), axis=1, keepdims=True)

    du = du_ref[:]                                                     # (8, 1)
    denom = fa - 2.0 * f0 + fb
    off = jnp.where(jnp.abs(denom) < _EPS, 0.0, 0.5 * du * (fa - fb) / denom)
    off = jnp.clip(off, -du, du)
    u0 = u0_ref[:] + idx.astype(jnp.float32) * du
    boundary = (idx == 0) | (idx == T - 1)
    out_ref[:] = jnp.where(boundary, u0, u0 + off)


@functools.partial(jax.jit, static_argnames=("use_pallas", "interpret"))
def closest_u_table_batch(
    table_xy: jnp.ndarray,   # (B, T, 2)
    table_u0: jnp.ndarray,   # (B,) first table parameter
    du: jnp.ndarray,         # (B,) table spacing
    pos: jnp.ndarray,        # (B, 2)
    *,
    use_pallas: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Refined u* per env from the dense table (the fine_points=0 semantics
    of ops/path.closest_u, batched).  B must be a multiple of 8 and T of 128
    for the pallas path; any shape works with use_pallas=False."""
    B, T, _ = table_xy.shape

    if not use_pallas:
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

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if B % _BLOCK_B or T % 128:
        raise ValueError(f"pallas path needs B%{_BLOCK_B}==0 and T%128==0, got {B},{T}")

    tx = table_xy[:, :, 0]
    ty = table_xy[:, :, 1]
    grid = (B // _BLOCK_B,)
    vec_spec = pl.BlockSpec((_BLOCK_B, T), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((_BLOCK_B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[vec_spec, vec_spec, col_spec, col_spec, col_spec, col_spec],
        out_specs=col_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
        interpret=interpret,
    )(
        tx, ty,
        pos[:, 0:1].astype(jnp.float32),
        pos[:, 1:2].astype(jnp.float32),
        table_u0[:, None].astype(jnp.float32),
        du[:, None].astype(jnp.float32),
    )
    return out[:, 0]
