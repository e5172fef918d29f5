"""Scenario and curriculum geometry — as data, not control flow.

Two halves:

1. Host-side (numpy, deterministic): the 7 spatial benchmark scenarios of
   reference `test_scenarios.py` (create_test_scenario :169-246,
   generate_scen_waypoints_2d :87-167, generate_scen_obstacles :4-84) plus
   the per-scenario spawn rectangles of `drone_2d_env.py:218-311`, padded to
   fixed MAX_WPS / MAX_OBS arrays once at env construction.

2. Device-side (jax.random): the curriculum's per-episode randomized
   geometry — random-corner waypoint chains (predef_path.py:307-363), the
   near-/on-path obstacle sampler (obstacles.py:58-89), and the
   global_step -> stage schedule (drone_2d_env.py:324-373), expressed as a
   pure function instead of the reference's checkpoint-filename glob
   (drone_2d_env.py:76-86).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from drone2d_tpu.config import EnvConfig, TEST_SCENARIOS
from drone2d_tpu.ops import path as jpath
from drone2d_tpu.utils.host_path import HostQPMI

# ---------------------------------------------------------------------------
# Host side: deterministic test scenarios
# ---------------------------------------------------------------------------


class ScenarioGeometry(NamedTuple):
    """Static numpy geometry for one test scenario."""

    wps: np.ndarray         # (MAX_WPS, 2) padded waypoints
    n_wps: int
    obs_xy: np.ndarray      # (MAX_OBS, 2)
    obs_r: np.ndarray       # (MAX_OBS,)
    obs_mask: np.ndarray    # (MAX_OBS,) bool
    spawn_rect: np.ndarray  # (4,) xmin, ymin, xmax, ymax
    obs_half_wh: "np.ndarray | None" = None  # (MAX_OBS, 2) box half-extents


def _chain(x1, y1, azimuths, distance):
    az = np.asarray(azimuths, dtype=np.float64)
    steps = distance * np.stack([np.cos(az), np.sin(az)], axis=-1)
    pts = np.concatenate([[[x1, y1]], steps], axis=0)
    return np.cumsum(pts, axis=0)


def scenario_waypoints(scen: str, w: float, h: float, *, n_wps: int = 10,
                       distance: float = 100.0, offset: float = 0.0) -> np.ndarray:
    """Deterministic scenario waypoint layouts (generate_scen_waypoints_2d)."""
    if scen in ("perpendicular", "parallel", "parallel_boxes", "impossible", "straight"):
        x1 = w / 2 - distance * (n_wps - 1) / 2
        return _chain(x1, h / 2, np.zeros(n_wps - 1), distance)
    if scen == "S_parallel":
        az = [(-1 if i % 2 == 0 else 1) * math.pi / 4 for i in range(n_wps - 1)]
        return _chain(w / 10, h / 2, az, distance)
    if scen == "corridor":
        x1 = w / 2 - distance * (n_wps - 1) / 2
        return _chain(x1, h / 2 + offset, np.zeros(n_wps - 1), distance)
    if scen == "S_corridor":
        az = [(-1 if i % 2 == 0 else 1) * math.pi / 4 for i in range(n_wps - 1)]
        return _chain(w / 7, h / 2 + offset, az, distance)
    if scen == "large":
        # a path that circumnavigates one huge central obstacle
        # (test_scenarios.py:137-164)
        n = int(w / 100)
        obs_rad = w / 5
        margin = 80.0
        circ_seg = math.pi * (obs_rad + margin) / (n - 3)
        distance = w / 10
        x1 = w / 2 - obs_rad - margin - distance
        y1 = h / 2 - margin
        wps = [np.array([x1, y1]), np.array([x1 + distance, y1])]
        for i in range(1, n - 1):
            az = math.pi / 2 - (i - 1) * math.pi / (n - 3)
            wps.append(wps[-1] + circ_seg * np.array([math.cos(az), math.sin(az)]))
        wps.append(wps[-1] + np.array([distance, 0.0]))
        return np.stack(wps)
    raise ValueError(f"unknown scenario waypoint layout: {scen}")


def _scenario_obstacles(scen: str, w: float, h: float) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic obstacle fields (generate_scen_obstacles + the
    per-scenario parameter overrides of create_test_scenario)."""
    xy, r = [], []

    def on_path_row(host: HostQPMI, us, size):
        for u in us:
            xy.append(host.point(u))
            r.append(size)

    if scen == "perpendicular":
        n, size = 6, 20.0
        host = HostQPMI(scenario_waypoints(scen, w, h))
        half = host.length / 2
        base = host.point(half)
        ang = host.direction_angle(half) - math.pi / 2
        start = n * size - size
        for i in range(n):
            off = start - i * size * 2
            xy.append(base + off * np.array([math.cos(ang), math.sin(ang)]))
            r.append(size)
    elif scen == "parallel":
        n, size = 6, 30.0
        host = HostQPMI(scenario_waypoints(scen, w, h))
        off = (host.length - n * size * 2) / 2 - size
        on_path_row(host, [off + i * size * 2 for i in range(1, n + 1)], size)
    elif scen == "S_parallel":
        n, size = 20, 15.0
        host = HostQPMI(scenario_waypoints(scen, w, h, n_wps=6, distance=300))
        off = (host.length - n * size * 2) / 2
        on_path_row(host, [off + i * size * 2 for i in range(1, n + 1)], size)
    elif scen == "corridor":
        for side in (+100.0, -100.0):
            host = HostQPMI(scenario_waypoints(scen, w, h, offset=side))
            n, free = 10, 100.0
            size = (host.length - 2 * free) / (n * 2)
            on_path_row(host, [i * size * 2 + free for i in range(1, n)], size)
    elif scen == "S_corridor":
        for side in (+150.0, -150.0):
            host = HostQPMI(
                scenario_waypoints(scen, w, h, n_wps=7, distance=200, offset=side)
            )
            n, free = 30, 100.0
            size = (host.length - 2 * free) / (n * 2)
            on_path_row(host, [i * size * 2 + free for i in range(1, n)], size)
    elif scen == "impossible":
        n, ring = 20, 100.0
        host = HostQPMI(scenario_waypoints(scen, w, h))
        size = 2 * math.pi * ring / (n * 2)
        base = host.point(host.length)
        pa = host.direction_angle(host.length)
        for i in range(1, n + 1):
            a = pa - i * 2 * math.pi / n
            xy.append(base + ring * np.array([math.cos(a), math.sin(a)]))
            r.append(size)
    elif scen == "large":
        xy.append(np.array([w / 2, h / 2]))
        r.append(w / 5)
    elif scen == "parallel_boxes":
        # the 'parallel' layout with Square obstacles (obstacles.py:20-31):
        # side 2*size squares centered on the path instead of radius-size
        # circles — the box-obstacle component exercised as a real scenario
        n, size = 6, 30.0
        host = HostQPMI(scenario_waypoints("parallel", w, h))
        off = (host.length - n * size * 2) / 2 - size
        on_path_row(host, [off + i * size * 2 for i in range(1, n + 1)], size)
    else:
        raise ValueError(f"unknown scenario: {scen}")
    return np.stack(xy), np.asarray(r, dtype=np.float64)


_SPAWN_RECTS = {
    # (xmin, ymin, xmax, ymax) — drone_2d_env.py:221-311
    "perpendicular": lambda w, h: (50.0, 50.0, w / 2 - 100, h - 100),
    "parallel": lambda w, h: (50.0, 150.0, w / 2 - 300, h - 300),
    "S_parallel": lambda w, h: (50.0, 150.0, w / 2 - 300, h - 300),
    "corridor": lambda w, h: (50.0, 150.0, w / 2 - 400, h - 300),
    "S_corridor": lambda w, h: (50.0, 150.0, w / 2 - 450, h - 300),
    "large": lambda w, h: (50.0, 150.0, w / 2 - w / 4 - 50, h - 300),
    "impossible": lambda w, h: (50.0, 150.0, w / 2, h - 300),
    "parallel_boxes": lambda w, h: (50.0, 150.0, w / 2 - 300, h - 300),
}


def build_test_scenario(cfg: EnvConfig) -> ScenarioGeometry:
    """Assemble padded fixed-shape geometry for cfg.scenario."""
    from drone2d_tpu.config import EXTRA_SCENARIOS

    scen = cfg.scenario
    if scen not in TEST_SCENARIOS + EXTRA_SCENARIOS:
        raise ValueError(f"{scen!r} is not a spatial test scenario")
    w, h = cfg.screensize_x, cfg.screensize_y

    if scen == "S_parallel":
        wps = scenario_waypoints(scen, w, h, n_wps=6, distance=300)
    elif scen == "S_corridor":
        wps = scenario_waypoints(scen, w, h, n_wps=7, distance=200)
    else:
        wps = scenario_waypoints(scen, w, h)

    n_wps = len(wps)
    if n_wps > cfg.max_wps:
        raise ValueError(f"{scen}: {n_wps} waypoints > max_wps={cfg.max_wps}")
    wps_pad = np.concatenate([wps, np.repeat(wps[-1:], cfg.max_wps - n_wps, 0)])

    xy, r = _scenario_obstacles(scen, w, h)
    k = len(xy)
    if k > cfg.max_obs:
        raise ValueError(f"{scen}: {k} obstacles > max_obs={cfg.max_obs}")
    obs_xy = np.full((cfg.max_obs, 2), 1e6)
    obs_r = np.zeros(cfg.max_obs)
    obs_mask = np.zeros(cfg.max_obs, bool)
    obs_xy[:k] = xy
    obs_r[:k] = r
    obs_mask[:k] = True

    obs_half_wh = None
    if scen == "parallel_boxes":
        # sizes in r are Square half-sides -> box half-extents, radius 0
        obs_half_wh = np.zeros((cfg.max_obs, 2), np.float32)
        obs_half_wh[:k] = np.stack([r, r], axis=-1)
        obs_r[:] = 0.0

    return ScenarioGeometry(
        wps=wps_pad.astype(np.float32),
        n_wps=n_wps,
        obs_xy=obs_xy.astype(np.float32),
        obs_r=obs_r.astype(np.float32),
        obs_mask=obs_mask,
        spawn_rect=np.asarray(_SPAWN_RECTS[scen](w, h), np.float32),
        obs_half_wh=obs_half_wh,
    )


# ---------------------------------------------------------------------------
# Device side: curriculum randomization
# ---------------------------------------------------------------------------

# stage schedule (drone_2d_env.py:326-362).  The reference's comparisons
# leave exact boundary steps undefined (strict < and > on both sides); we
# use half-open intervals.
STAGE_BOUNDS = (700_000, 1_000_000, 1_600_000, 2_000_000)


def stage_from_step(global_step: jnp.ndarray) -> jnp.ndarray:
    """Curriculum stage 1..5 as a pure function of the global env-step count —
    replacing the reference's cross-process checkpoint-filename glob
    (drone_2d_env.py:79-86)."""
    s = jnp.asarray(global_step)
    bounds = jnp.asarray(STAGE_BOUNDS, s.dtype)
    return (1 + jnp.sum(s >= bounds)).astype(jnp.int32)


def stage3_spawn_chance(global_step) -> jnp.ndarray:
    """Linear 0.2 -> 0.6 over [1.0M, 1.6M] (drone_2d_env.py:336-343)."""
    s = jnp.asarray(global_step, jnp.float32)
    return jnp.clip((s - 1.0e6) * (0.6 - 0.2) / 0.6e6 + 0.2, 0.2, 0.6)


def stage4_spawn_chance(global_step) -> jnp.ndarray:
    """Linear 0.6 -> 1.0 over [1.6M, 2.0M] (drone_2d_env.py:348-357)."""
    s = jnp.asarray(global_step, jnp.float32)
    return jnp.clip((s - 1.6e6) * (1.0 - 0.6) / 0.4e6 + 0.6, 0.6, 1.0)


def random_corner_waypoints(key: jax.Array, cfg: EnvConfig) -> jnp.ndarray:
    """Random waypoint chain from a random screen corner
    (predef_path.py:307-363 + corner pick at drone_2d_env.py:201-212).

    Returns padded (max_wps, 2) float32; live count is cfg.n_wps.
    Corner indices: 1=DL, 2=DR, 3=UL, 4=UR.
    """
    w, h = cfg.screensize_x, cfg.screensize_y
    kc, kx, ky, ka = jax.random.split(key, 4)

    if cfg.random_path_spawn:
        lo, hi = cfg.spawn_corners
        corner = jax.random.randint(kc, (), lo, hi + 1)
    else:
        corner = jnp.int32(2)  # 'DR' (drone_2d_env.py:214)

    right = (corner == 2) | (corner == 4)
    up = (corner == 3) | (corner == 4)
    x1 = jnp.where(right, w - 180.0, 100.0) + jax.random.uniform(kx, ()) * 80.0
    y1 = jnp.where(up, h - 180.0, 100.0) + jax.random.uniform(ky, ()) * 80.0

    az_lo = jnp.select(
        [corner == 1, corner == 2, corner == 3, corner == 4],
        [0.0, jnp.pi / 2, -jnp.pi / 2, -jnp.pi],
    )
    az = az_lo + jax.random.uniform(ka, (cfg.max_wps - 1,)) * (jnp.pi / 2)
    live = jnp.arange(cfg.max_wps - 1) < (cfg.n_wps - 1)
    steps = cfg.path_segment_length * jnp.stack([jnp.cos(az), jnp.sin(az)], -1)
    steps = jnp.where(live[:, None], steps, 0.0)
    first = jnp.stack([x1, y1])
    return jnp.concatenate([first[None], first[None] + jnp.cumsum(steps, 0)], 0)


def _sample_near_path_obstacle(key, pd: jpath.PathData, std: float, attempts: int,
                               r_min: float = 10.0, r_max: float = 50.0):
    """One near-path obstacle via rejection sampling (obstacles.py:63-81):
    u ~ U(0.2L, 0.9L), lateral offset ~ N(0, std), radius ~ U(r_min, r_max)
    (reference: U(10, 50)); accept when |offset| > radius + 10.  Fixed
    `attempts` draws; if none accepts (p ~ (1-0.55)^attempts), the last
    draw's offset is pushed just outside the margin."""
    ku, kd, ks = jax.random.split(key, 3)
    u = jax.random.uniform(ku, (attempts,), minval=0.2 * pd.length, maxval=0.9 * pd.length)
    dist = std * jax.random.normal(kd, (attempts,))
    size = jax.random.uniform(ks, (attempts,), minval=r_min, maxval=r_max)

    base = jax.vmap(lambda uu: jpath.path_point(pd, uu))(u)
    pa = jax.vmap(lambda uu: jpath.direction_angle(pd, uu))(u) - jnp.pi / 2
    normal_dir = jnp.stack([jnp.cos(pa), jnp.sin(pa)], -1)

    accept = jnp.abs(dist) > size + 10.0
    idx = jnp.argmax(accept)  # first accepted, 0 if none
    got_one = jnp.any(accept)
    i = jnp.where(got_one, idx, attempts - 1)
    d_sel = dist[i]
    s_sel = size[i]
    sign = jnp.where(d_sel < 0, -1.0, 1.0)
    d_forced = sign * (s_sel + 11.0)
    d_final = jnp.where(got_one, d_sel, d_forced)
    pos = base[i] + d_final * normal_dir[i]
    return pos, s_sel


def _sample_on_path_obstacle(key, pd: jpath.PathData,
                             r_min: float = 10.0, r_max: float = 50.0):
    """One obstacle placed directly on the path (obstacles.py:82-85)."""
    ku, ks = jax.random.split(key)
    u = jax.random.uniform(ku, (), minval=0.2 * pd.length, maxval=0.9 * pd.length)
    size = jax.random.uniform(ks, (), minval=r_min, maxval=r_max)
    return jpath.path_point(pd, u), size


def corridor_obstacles(key: jax.Array, cfg: EnvConfig, pd: jpath.PathData):
    """Corridor walls along a (random) path — training-time rehearsal of the
    corridor/S_corridor eval obstacle family (test_scenarios.py:20-52,
    create_test_scenario corridor branches).

    The eval scenarios build two offset paths and tile each with n touching
    circles of radius (L - 2*free)/(2n) starting after a free end margin;
    here the same recipe runs on the EPISODE's own random path using
    per-point lateral normals (offset ~ U(90, 180) px vs the eval's fixed
    ±100/±150), so the agent practices wall-following on path shapes it has
    never seen.  Fixed shapes: n = (max_obs - 1)//2 circles per side
    (31/side at max_obs=64 ≈ S_corridor's 30/side).

    Returns (xy (max_obs, 2), r (max_obs,), mask (max_obs,)).
    """
    n = (cfg.max_obs - 1) // 2
    free = 100.0
    off = jax.random.uniform(key, (), minval=90.0, maxval=180.0)
    size = (pd.length - 2.0 * free) / (2.0 * n)
    # circle centers tile [free, L - free] at spacing 2*size (touching),
    # mirroring the eval's `i * size * 2 + free` placement
    us = free + size * (2.0 * jnp.arange(1, n + 1) - 1.0)
    base = jax.vmap(lambda u: jpath.path_point(pd, u))(us)
    pa = jax.vmap(lambda u: jpath.direction_angle(pd, u))(us) - jnp.pi / 2
    normal = jnp.stack([jnp.cos(pa), jnp.sin(pa)], -1)
    xy = jnp.concatenate([base + off * normal, base - off * normal], 0)
    r = jnp.full((2 * n,), size)
    pad = cfg.max_obs - 2 * n
    xy = jnp.concatenate([xy, jnp.full((pad, 2), 1e6)], 0)
    r = jnp.concatenate([r, jnp.zeros((pad,))], 0)
    mask = jnp.arange(cfg.max_obs) < 2 * n
    return xy.astype(jnp.float32), r.astype(jnp.float32), mask


def cross_obstacles(key: jax.Array, cfg: EnvConfig, pd: jpath.PathData):
    """A crossing wall on a (random) path — training-time rehearsal of the
    perpendicular eval obstacle family (test_scenarios.py:4-30, the
    perpendicular branch: 6 touching radius-20 circles centered across the
    path midpoint).

    Here the same wall is built on the EPISODE's own random path with a
    random arc-length position u ~ U(0.3L, 0.7L), random circle radius
    ~ U(15, 40), and a random lateral centering offset ~ U(-60, 60) px (the
    eval wall is symmetric; off-center walls teach finding the shorter way
    around either end).  Fixed shapes: 6 circles + padding to max_obs.

    Returns (xy (max_obs, 2), r (max_obs,), mask (max_obs,)).
    """
    n = 6
    k_u, k_r, k_c = jax.random.split(key, 3)
    size = jax.random.uniform(k_r, (), minval=15.0, maxval=40.0)
    u = pd.length * jax.random.uniform(k_u, (), minval=0.3, maxval=0.7)
    base = jpath.path_point(pd, u)
    ang = jpath.direction_angle(pd, u) - jnp.pi / 2
    normal = jnp.stack([jnp.cos(ang), jnp.sin(ang)])
    center = jax.random.uniform(k_c, (), minval=-60.0, maxval=60.0)
    # touching circles tile offsets start, start-2r, ... (eval: start - i*2r)
    offs = (n * size - size) - jnp.arange(n) * size * 2.0 + center
    xy = base[None, :] + offs[:, None] * normal[None, :]
    r = jnp.full((n,), size)
    pad = cfg.max_obs - n
    xy = jnp.concatenate([xy, jnp.full((pad, 2), 1e6)], 0)
    r = jnp.concatenate([r, jnp.zeros((pad,))], 0)
    mask = jnp.arange(cfg.max_obs) < n
    return xy.astype(jnp.float32), r.astype(jnp.float32), mask


def curriculum_obstacles(
    key: jax.Array,
    cfg: EnvConfig,
    pd: jpath.PathData,
    stage: jnp.ndarray,
    global_step,
):
    """Stage-dependent obstacle field (drone_2d_env.py:326-372).

    Layout: slots [0, max_curriculum_obs) near-path candidates, slot
    [max_curriculum_obs] on-path, the rest padding.  Returns
    (xy (max_obs, 2), r (max_obs,), mask (max_obs,)).
    """
    m = cfg.max_curriculum_obs
    k_near, k_on, k_b3, k_b4, k_n5 = jax.random.split(key, 5)

    near_xy, near_r = jax.vmap(
        lambda k: _sample_near_path_obstacle(
            k, pd, 100.0, cfg.obstacle_attempts,
            cfg.obstacle_radius_min, cfg.obstacle_radius_max,
        )
    )(jax.random.split(k_near, m))
    on_xy, on_r = _sample_on_path_obstacle(
        k_on, pd, cfg.obstacle_radius_min, cfg.obstacle_radius_max
    )

    # stage 3: p(step) chance of ONE near-path obstacle; 0.6 if forced stage
    chance3 = jnp.where(
        jnp.asarray(global_step, jnp.float32) < 0, 0.6, stage3_spawn_chance(global_step)
    )
    # stage 4: p(step) chance of ONE on-path obstacle; 1.0 if forced stage
    chance4 = jnp.where(
        jnp.asarray(global_step, jnp.float32) < 0, 1.0, stage4_spawn_chance(global_step)
    )
    b3 = jax.random.bernoulli(k_b3, chance3)
    b4 = jax.random.bernoulli(k_b4, chance4)

    # stage 5: n ~ N(1, 4); -3<n<0 -> 1; n<-3 -> 0; else ceil(n)
    # (the reference's float `while num < n` loop rounds positive n up)
    n5 = 1.0 + 4.0 * jax.random.normal(k_n5, ())
    count5 = jnp.where(
        n5 < -3.0, 0, jnp.where(n5 < 0.0, 1, jnp.ceil(n5).astype(jnp.int32))
    )
    count5 = jnp.clip(count5, 0, m)

    slot = jnp.arange(m)
    near_count = jnp.select(
        [stage == 3, stage == 5],
        [b3.astype(jnp.int32), count5],
        0,
    )
    near_mask = slot < near_count
    on_mask = ((stage == 4) & b4) | ((stage == 5) & (count5 > 0))

    pad = cfg.max_obs - m - 1
    xy = jnp.concatenate([near_xy, on_xy[None], jnp.full((pad, 2), 1e6)], 0)
    r = jnp.concatenate([near_r, on_r[None], jnp.zeros((pad,))], 0)
    mask = jnp.concatenate([near_mask, on_mask[None], jnp.zeros((pad,), bool)], 0)
    xy = jnp.where(mask[:, None], xy, 1e6)
    return xy.astype(jnp.float32), r.astype(jnp.float32), mask
