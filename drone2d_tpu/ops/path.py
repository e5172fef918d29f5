"""QPMI2D path kernel — quadratic-polynomial membership interpolation in 2D.

Re-implements the semantics of reference `drone_2d_custom_gym_env/predef_path.py`
(class QPMI2D) as fixed-shape array math:

* `make_path`       <- QPMI2D.__init__/_calculate_us/calculate_quadratic_params
                       (predef_path.py:10-51).  The reference solves a raw
                       [u^2, u, 1] Vandermonde system in float64; that is
                       ill-conditioned in float32 at u ~ 1e3, so we fit the
                       SAME quadratic in the segment-centered variable
                       tau = u - u_center via a closed-form Lagrange fit —
                       mathematically identical polynomials, float32-safe.
* `path_point`      <- QPMI2D.__call__ (predef_path.py:88-142), including the
                       reference's Python-negative-index wrap for u < 0 in the
                       membership branch (x_params[n-1] with n == 0 selects the
                       LAST segment's polynomial — replicated faithfully so
                       the closest-point functional matches).
* `path_gradient`   <- QPMI2D.calculate_gradient (predef_path.py:145-188)
* `direction_angle` <- QPMI2D.get_direction_angle (predef_path.py:216-223)
* `closest_u`       <- QPMI2D.get_closest_u (predef_path.py:226-248).  The
                       reference runs scipy fminbound (Brent) over the whole
                       [-margin, L+margin] interval each query (>= 2 scalar
                       optimizations per env step — its dominant cost).  Here:
                       a dense precomputed arc-length table argmin + a
                       fixed-iteration golden-section refine, fully batched.
* `lookahead_point_from_u` <- QPMI2D.get_lookahead_point (predef_path.py:257-266)

All functions take a single path and scalar u; batch over envs with
`jax.vmap`.  Paths are padded to `max_wps` waypoints (repeat last waypoint);
`n_wps` carries the live count.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-9


class PathData(NamedTuple):
    """Per-env path pytree (fixed shapes; padded beyond n_wps)."""

    wps: jnp.ndarray       # (MAX_WPS, 2) waypoints, padded with last wp
    n_wps: jnp.ndarray     # () int32, live waypoint count (>= 3)
    us: jnp.ndarray        # (MAX_WPS,) cumulative arc parameter per waypoint
    centers: jnp.ndarray   # (MAX_WPS-2,) tau-origin (u of the fit's middle wp)
    coef_x: jnp.ndarray    # (MAX_WPS-2, 3) centered quadratic [a, b, c]
    coef_y: jnp.ndarray    # (MAX_WPS-2, 3)
    length: jnp.ndarray    # () total arc parameter (us[n_wps-1])
    table_u: jnp.ndarray   # (TABLE_N,) sample params over [-margin, L+margin]
    # Path points at table_u, stored structure-of-arrays: a (TABLE_N, 2)
    # array tiles its minor dim 2 up to the 128-lane TPU register width,
    # wasting ~64x the closest-point scan's bandwidth (measured: the whole
    # env step dropped ~25 ns/env-step from this split alone).
    table_x: jnp.ndarray   # (TABLE_N,)
    table_y: jnp.ndarray   # (TABLE_N,)


def _u_index(us: jnp.ndarray, n_wps: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Segment index per reference get_u_index (predef_path.py:53-63).

    First n in [0, n_wps-1) with u <= us[n+1], else n_wps-1.  Equivalent to
    counting how many of us[1..n_wps-1] are strictly below u.
    """
    k = jnp.arange(1, us.shape[0])
    hits = (u > us[k]) & (k <= n_wps - 1)
    return jnp.sum(hits.astype(jnp.int32))


def _eval(pd: PathData, u: jnp.ndarray, deriv: bool) -> jnp.ndarray:
    """Shared body of path_point / path_gradient for scalar u.

    TPU note: written GATHER-FREE.  Under vmap every dynamic index
    (`coef[n]`, `us[n]`) would become a batched gather — hundreds of tiny
    unfusable kernels per env step.  Instead we evaluate ALL max_wps-2
    segment quadratics densely (a (S,)-wide VPU op) and combine them with a
    one-hot weight vector; selections from `us` become one-hot dot products.
    Semantics are identical to the reference's branchy scalar code,
    including the Python-negative-index wrap for u below the path start
    (x_params[n-1] with n == 0 -> LAST segment, predef_path.py:114-141).
    """
    n_wps = pd.n_wps
    S = pd.coef_x.shape[0]
    n_params = n_wps - 2  # live quadratic segments
    sidx = jnp.arange(S)
    widx = jnp.arange(pd.us.shape[0])

    def us_at(i):  # one-hot gather from the (max_wps,) u-knot table
        return jnp.sum(jnp.where(widx == i, pd.us, 0.0))

    us_last = us_at(n_wps - 1)           # == length
    us_second_last = us_at(n_wps - 2)

    n = _u_index(pd.us, n_wps, u)

    # dense evaluation of every segment's centered quadratic at u
    tau = u - pd.centers                                     # (S,)
    if deriv:
        vx = 2.0 * pd.coef_x[:, 0] * tau + pd.coef_x[:, 1]
        vy = 2.0 * pd.coef_y[:, 0] * tau + pd.coef_y[:, 1]
    else:
        vx = (pd.coef_x[:, 0] * tau + pd.coef_x[:, 1]) * tau + pd.coef_x[:, 2]
        vy = (pd.coef_y[:, 0] * tau + pd.coef_y[:, 1]) * tau + pd.coef_y[:, 2]

    first = (u >= pd.us[0]) & (u <= pd.us[1])
    if deriv:
        # calculate_gradient's last-stretch test has no -0.001 epsilon and no
        # index check (predef_path.py:157) — replicated.
        last = u >= us_second_last
    else:
        last = ((u >= us_second_last - 0.001) & (u <= us_last)) | (n == n_wps - 1)

    # membership blending (predef_path.py:114-141)
    j1 = jnp.where(n - 1 < 0, n_params - 1, n - 1)          # x_params[n-1]
    j1 = jnp.clip(j1, 0, S - 1)
    j2 = jnp.clip(n, 0, S - 1)                              # x_params[n]
    un = us_at(jnp.clip(n, 0, pd.us.shape[0] - 1))
    un1 = us_at(jnp.clip(n + 1, 0, pd.us.shape[0] - 1))
    denom = jnp.where(jnp.abs(un1 - un) < _EPS, _EPS, un1 - un)
    mu_r = (u - un) / denom
    mu_f = (un1 - u) / denom

    # one weight vector expressing all three branches, then a single reduction
    jl = jnp.clip(n_params - 1, 0, S - 1)
    w_mid = mu_r * (sidx == j2) + mu_f * (sidx == j1)
    w_first = (sidx == 0).astype(vx.dtype)
    w_last = (sidx == jl).astype(vx.dtype)
    w = jnp.where(first, w_first, jnp.where(last, w_last, w_mid))

    return jnp.stack([jnp.sum(w * vx), jnp.sum(w * vy)])


def path_point(pd: PathData, u: jnp.ndarray) -> jnp.ndarray:
    """Path position at parameter u (reference __call__, predef_path.py:88-142)."""
    return _eval(pd, u, deriv=False)


def path_gradient(pd: PathData, u: jnp.ndarray) -> jnp.ndarray:
    """d(path)/du at u (reference calculate_gradient, predef_path.py:145-188)."""
    return _eval(pd, u, deriv=True)


def direction_angle(pd: PathData, u: jnp.ndarray) -> jnp.ndarray:
    """Tangent azimuth atan2(dy, dx) (predef_path.py:216-223)."""
    g = path_gradient(pd, u)
    return jnp.arctan2(g[1], g[0])


def _lagrange_quad(t0, t1, t2, p0, p1, p2):
    """Closed-form quadratic through (t0,p0),(t1,p1),(t2,p2): returns (a,b,c)
    of a*t^2 + b*t + c.  Assumes distinct t (guarded by caller)."""
    d0 = (t0 - t1) * (t0 - t2)
    d1 = (t1 - t0) * (t1 - t2)
    d2 = (t2 - t0) * (t2 - t1)
    w0, w1, w2 = p0 / d0, p1 / d1, p2 / d2
    a = w0 + w1 + w2
    b = -(w0 * (t1 + t2) + w1 * (t0 + t2) + w2 * (t0 + t1))
    c = w0 * t1 * t2 + w1 * t0 * t2 + w2 * t0 * t1
    return a, b, c


def make_path(
    wps: jnp.ndarray,
    n_wps: jnp.ndarray,
    *,
    table_n: int,
    margin: float = 10.0,
) -> PathData:
    """Build PathData from padded waypoints.

    wps: (MAX_WPS, 2); entries at index >= n_wps MUST repeat the last live
    waypoint (zero-length padded segments).  n_wps: scalar int32 >= 3.
    """
    max_wps = wps.shape[0]
    idx = jnp.arange(max_wps)

    # cumulative arc parameter (predef_path.py:20-26); padded segments are 0
    diffs = wps[1:] - wps[:-1]
    seg_valid = (idx[:-1] < n_wps - 1).astype(wps.dtype)
    seg_len = jnp.sqrt(jnp.sum(diffs * diffs, axis=-1)) * seg_valid
    us = jnp.concatenate([jnp.zeros((1,), wps.dtype), jnp.cumsum(seg_len)])
    length = us[n_wps - 1]

    # per-segment quadratics (predef_path.py:28-50): for each interior
    # waypoint n in [1, n_wps-2], fit x(u), y(u) through
    # (u_{n-1}, p_{n-1}), (u_n, p_n), (u_{n+1}, p_{n+1}), centered at u_n.
    j = jnp.arange(max_wps - 2)
    n = j + 1
    valid = n <= n_wps - 2
    i0 = jnp.clip(n - 1, 0, max_wps - 1)
    i1 = jnp.clip(n, 0, max_wps - 1)
    i2 = jnp.clip(n + 1, 0, max_wps - 1)
    centers = us[i1]
    t0 = us[i0] - centers
    t1 = jnp.zeros_like(centers)
    t2 = us[i2] - centers
    # guard degenerate (padded) fits; masked out of use by n_wps logic anyway
    t0 = jnp.where(valid, t0, -1.0)
    t2 = jnp.where(valid, t2, 1.0)
    ax, bx, cx = _lagrange_quad(t0, t1, t2, wps[i0, 0], wps[i1, 0], wps[i2, 0])
    ay, by, cy = _lagrange_quad(t0, t1, t2, wps[i0, 1], wps[i1, 1], wps[i2, 1])
    coef_x = jnp.stack([ax, bx, cx], axis=-1)
    coef_y = jnp.stack([ay, by, cy], axis=-1)

    pd = PathData(
        wps=wps,
        n_wps=jnp.asarray(n_wps, jnp.int32),
        us=us,
        centers=centers,
        coef_x=coef_x,
        coef_y=coef_y,
        length=length,
        table_u=jnp.zeros((table_n,), wps.dtype),
        table_x=jnp.zeros((table_n,), wps.dtype),
        table_y=jnp.zeros((table_n,), wps.dtype),
    )

    # dense sample table over the fminbound search interval
    # [-margin, L+margin] (predef_path.py:243-244)
    t = jnp.linspace(0.0, 1.0, table_n).astype(wps.dtype)
    table_u = -margin + t * (length + 2 * margin)
    table_xy = jax.vmap(lambda uu: path_point(pd, uu))(table_u)
    return pd._replace(
        table_u=table_u, table_x=table_xy[:, 0], table_y=table_xy[:, 1]
    )


def closest_u(
    pd: PathData,
    position: jnp.ndarray,
    *,
    golden_iters: int = 0,
    fine_points: int = 0,
) -> jnp.ndarray:
    """argmin_u |path(u) - position| over [-margin, L+margin].

    Replaces the reference's per-step scipy fminbound (predef_path.py:246-248).
    Fast paths (golden_iters=0, the hot-loop default), all data-parallel with
    zero serial chains:

    * fine_points=0: dense table argmin + one-shot parabolic interpolation
      through the three bracketing TABLE samples (no extra path evals at
      all).  Accuracy ~du/2 at worst (derivative kinks at segment
      boundaries); pair with a fine table (EnvConfig.path_table_n=2048 ->
      du~0.55 px) — the fewest, largest, most fusion-friendly ops.
    * fine_points=R>0: additionally rescan the winning bracket with R
      path evaluations at 2*du/(R-1) spacing and parabola-fit the best
      fine triple — same accuracy with a 4x coarser table, trading table
      bandwidth for branchy polynomial evals.

    Parity path (golden_iters>0): additionally run that many golden-section
    iterations on the 2-cell bracket for fminbound-tight conformance runs.

    GATHER-FREE by design: under vmap a scalar indexing like dist2[i0]
    becomes a batched 1-element gather, measured at ~13 ns/env-step EACH on
    TPU (4 of them dominated this function).  All table lookups here are
    one-hot masked reductions / shifted-array selects instead — pure
    elementwise+reduce VPU work (79 -> ~19 ns/env-step at 4096 envs).
    """
    dx = pd.table_x - position[0]
    dy = pd.table_y - position[1]
    dist2 = dx * dx + dy * dy
    i0 = jnp.argmin(dist2)
    T = pd.table_u.shape[0]
    onehot = jnp.arange(T) == i0

    def pick(arr):
        return jnp.sum(jnp.where(onehot, arr, 0.0))

    # neighbor values via edge-clamped shifts: prev[i] = arr[max(i-1, 0)],
    # nxt[i] = arr[min(i+1, T-1)] — matches the im/ip clamping exactly
    prev = lambda a: jnp.concatenate([a[:1], a[:-1]])
    nxt = lambda a: jnp.concatenate([a[1:], a[-1:]])

    u0 = pick(pd.table_u)

    def f(u):
        p = path_point(pd, u) - position
        return jnp.sum(p * p)

    du = (pd.table_u[-1] - pd.table_u[0]) / (T - 1)

    if golden_iters <= 0 and fine_points <= 0:
        fa, f0, fb = pick(prev(dist2)), pick(dist2), pick(nxt(dist2))
        denom = fa - 2.0 * f0 + fb
        offset = jnp.where(jnp.abs(denom) < _EPS, 0.0, 0.5 * du * (fa - fb) / denom)
        u_star = u0 + jnp.clip(offset, -du, du)
        u_star = jnp.where((i0 == 0) | (i0 == T - 1), u0, u_star)
        return jnp.clip(u_star, pd.table_u[0], pd.table_u[-1])

    if golden_iters <= 0:
        R = fine_points
        fine_u = u0 + jnp.linspace(-du, du, R)
        fine_f = jax.vmap(f)(fine_u)
        j = jnp.clip(jnp.argmin(fine_f), 1, R - 2)
        fa2, f02, fb2 = fine_f[j - 1], fine_f[j], fine_f[j + 1]
        h = 2.0 * du / (R - 1)
        denom = fa2 - 2.0 * f02 + fb2
        offset = jnp.where(jnp.abs(denom) < _EPS, 0.0, 0.5 * h * (fa2 - fb2) / denom)
        u_star = fine_u[j] + jnp.clip(offset, -h, h)
        lo, hi = pd.table_u[0], pd.table_u[-1]
        return jnp.clip(u_star, lo, hi)

    invphi = 0.6180339887498949   # 1/phi
    invphi2 = 0.3819660112501051  # 1/phi^2

    a, b = pick(prev(pd.table_u)), pick(nxt(pd.table_u))
    c = a + invphi2 * (b - a)
    dd = a + invphi * (b - a)
    fc, fd = f(c), f(dd)

    def body(_, carry):
        a, b, c, dd, fc, fd = carry
        shrink_left = fc < fd
        a2 = jnp.where(shrink_left, a, c)
        b2 = jnp.where(shrink_left, dd, b)
        c2 = jnp.where(shrink_left, a2 + invphi2 * (b2 - a2), dd)
        d2 = jnp.where(shrink_left, c, a2 + invphi * (b2 - a2))
        f_new = f(jnp.where(shrink_left, c2, d2))  # one path eval per iter
        fc2 = jnp.where(shrink_left, f_new, fd)
        fd2 = jnp.where(shrink_left, fc, f_new)
        return a2, b2, c2, d2, fc2, fd2

    a, b, c, dd, fc, fd = jax.lax.fori_loop(
        0, golden_iters, body, (a, b, c, dd, fc, fd)
    )
    return 0.5 * (a + b)


def closest_position(
    pd: PathData, position: jnp.ndarray, *, golden_iters: int
) -> jnp.ndarray:
    """Closest point on path (reference get_closest_position, predef_path.py:251-255)."""
    return path_point(pd, closest_u(pd, position, golden_iters=golden_iters))


def lookahead_point_from_u(
    pd: PathData, u: jnp.ndarray, lookahead_distance
) -> jnp.ndarray:
    """Lookahead given an already-computed closest u.

    The reference recomputes get_closest_u inside get_lookahead_point
    (predef_path.py:257-266) with identical inputs; we compute u once per
    step and reuse it (bit-identical result, half the search cost).
    """
    u_la = jnp.minimum(u + lookahead_distance, pd.length)
    return path_point(pd, u_la)


def path_coords(pd: PathData, n: int = 100) -> jnp.ndarray:
    """n evenly spaced points over [0, L] (reference get_path_coord,
    predef_path.py:297-304) — host-side rendering helper."""
    u = jnp.linspace(0.0, 1.0, n) * pd.length
    return jax.vmap(lambda uu: path_point(pd, uu))(u)
