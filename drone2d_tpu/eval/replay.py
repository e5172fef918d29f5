"""Replay committed reference flight paths through the path kernel.

The reference's test harness dumps, per episode, the drone position at every
step as `(x, screen_height - y)` pairs (`main.py:297-327`, recorded at
`drone_2d_env.py:984-986`) next to `apes.npy`, where
`APE = path_error / t` accumulates the per-step distance to the
fminbound-found closest path point (`drone_2d_env.py:529,589-590`).

Feeding those positions back through `ops.path.closest_u` must reproduce each
committed APE — a conformance check of the production path kernel against
real scipy-fminbound-era data, episode by episode, with no simulation in the
loop at all.
"""

from __future__ import annotations

import json
import os
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from drone2d_tpu.ops import path as jpath


class ReplayReport(NamedTuple):
    ape_ref: np.ndarray    # (N,) committed apes.npy
    ape_ours: np.ndarray   # (N,) replayed through the kernel
    n_steps: np.ndarray    # (N,) episode lengths

    @property
    def abs_err(self) -> np.ndarray:
        return np.abs(self.ape_ours - self.ape_ref)


def load_flight_paths(res_dir: str, screen_h: float) -> List[np.ndarray]:
    """Committed flight_paths JSON -> list of (n_i, 2) WORLD positions."""
    with open(os.path.join(res_dir, "flight_paths")) as f:
        raw = json.load(f)
    out = []
    for ep in raw:
        a = np.asarray(ep, dtype=np.float64)
        a[:, 1] = screen_h - a[:, 1]  # undo the screen-coordinate flip
        out.append(a)
    return out


def replay_ape(
    pd: jpath.PathData,
    episodes: List[np.ndarray],
    *,
    golden_iters: int = 24,
) -> np.ndarray:
    """Per-episode mean distance-to-path over the recorded positions.

    All episodes' positions are concatenated into one batch so the whole
    campaign replays as a single vmapped device program; per-episode means
    come from a segment reduction on the host side.
    """
    lens = np.array([len(e) for e in episodes])
    flat = np.concatenate(episodes, axis=0).astype(np.float32)

    def dist(p):
        cp = jpath.closest_position(pd, p, golden_iters=golden_iters)
        return jnp.sqrt(jnp.sum((cp - p) ** 2))

    d = np.asarray(jax.jit(jax.vmap(dist))(jnp.asarray(flat)), np.float64)
    bounds = np.concatenate([[0], np.cumsum(lens)])
    return np.array(
        [d[bounds[i]:bounds[i + 1]].mean() for i in range(len(lens))]
    )


def replay_ape_fminbound(wps: np.ndarray, episodes: List[np.ndarray]) -> np.ndarray:
    """Per-episode APE replay with the reference's EXACT optimizer semantics:
    scipy.optimize.fminbound (xtol=1e-6, maxfun=500, full [-10, L+10]
    interval, predef_path.py:242-248) minimizing distance to OUR host float64
    path evaluation (utils.host_path.HostQPMI).

    On curved paths the distance-to-path functional is multimodal and
    fminbound converges to a probe-sequence-dependent local minimum, not the
    global one — the committed apes.npy embodies that behavior.  Matching it
    here isolates the comparison to the path-evaluation semantics (segment
    quadratics + membership blending + negative-u wrap), optimizer held
    identical; the production kernel is deliberately NOT bug-compatible (it
    finds the true global minimum — see replay_ape)."""
    from scipy.optimize import fminbound

    from drone2d_tpu.utils.host_path import HostQPMI

    host = HostQPMI(np.asarray(wps, np.float64))
    L = host.us[-1]

    def dist_fn(pos):
        return lambda u: float(np.linalg.norm(host.point(u) - pos))

    out = []
    for ep in episodes:
        d = np.empty(len(ep))
        for i, pos in enumerate(ep):
            u = fminbound(dist_fn(pos), x1=-10.0, x2=L + 10.0,
                          xtol=1e-6, maxfun=500)
            d[i] = np.linalg.norm(host.point(u) - pos)
        out.append(d.mean())
    return np.array(out)


def replay_campaign(
    res_dir: str,
    scenario: str,
    *,
    golden_iters: int = 24,
    table_n: int = 2048,
) -> ReplayReport:
    """Replay one committed scenario campaign directory against the kernel."""
    from drone2d_tpu.eval.run import scenario_config

    cfg = scenario_config(scenario).replace(path_table_n=table_n)
    from drone2d_tpu.env import scenarios

    geo = scenarios.build_test_scenario(cfg)
    pd = jpath.make_path(
        jnp.asarray(geo.wps), jnp.int32(geo.n_wps),
        table_n=cfg.path_table_n, margin=cfg.closest_u_margin,
    )
    episodes = load_flight_paths(res_dir, cfg.screensize_y)
    ape_ref = np.load(os.path.join(res_dir, "apes.npy"))
    assert len(episodes) == len(ape_ref), (len(episodes), len(ape_ref))
    ape_ours = replay_ape(pd, episodes, golden_iters=golden_iters)
    return ReplayReport(
        ape_ref=np.asarray(ape_ref, np.float64),
        ape_ours=ape_ours,
        n_steps=np.array([len(e) for e in episodes]),
    )
