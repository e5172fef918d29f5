"""Pallas closest-point kernel: interpret-mode equivalence with both the jnp
fallback and the scalar ops/path implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drone2d_tpu.ops import path as jpath
from drone2d_tpu.ops.pallas_path import closest_u_table_batch

B, TABLE_N = 16, 256


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    paths = []
    for i in range(B):
        wps = [np.array([150.0, 140.0]) + i]
        for _ in range(9):
            az = rng.uniform(0, np.pi / 2)
            wps.append(wps[-1] + 100 * np.array([np.cos(az), np.sin(az)]))
        wps = np.stack(wps)
        padded = np.concatenate([wps, np.repeat(wps[-1:], 2, 0)])
        paths.append(
            jpath.make_path(jnp.asarray(padded, jnp.float32), jnp.int32(10),
                            table_n=TABLE_N)
        )
    pd = jax.tree.map(lambda *xs: jnp.stack(xs), *paths)
    pos = jnp.asarray(rng.uniform(0, 1200, (B, 2)), jnp.float32)
    table_u0 = pd.table_u[:, 0]
    du = (pd.table_u[:, -1] - pd.table_u[:, 0]) / (TABLE_N - 1)
    return pd, pos, table_u0, du


def test_fallback_matches_scalar_closest_u(batch):
    pd, pos, table_u0, du = batch
    got = closest_u_table_batch(pd.table_xy, table_u0, du, pos, use_pallas=False)
    want = jax.vmap(
        lambda p, x: jpath.closest_u(p, x, golden_iters=0, fine_points=0)
    )(pd, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_pallas_interpret_matches_fallback(batch):
    pd, pos, table_u0, du = batch
    a = closest_u_table_batch(
        pd.table_xy, table_u0, du, pos, use_pallas=True, interpret=True
    )
    b = closest_u_table_batch(pd.table_xy, table_u0, du, pos, use_pallas=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_pallas_shape_guard(batch):
    pd, pos, table_u0, du = batch
    with pytest.raises(ValueError):
        closest_u_table_batch(
            pd.table_xy[:, : TABLE_N - 3], table_u0, du, pos,
            use_pallas=True, interpret=True,
        )
