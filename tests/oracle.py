"""Independent float64 numpy/scipy oracle for conformance tests.

Implements the QPMI2D math and the composite-drone physics directly from the
equations documented in SURVEY.md / the reference's published formulas
(predef_path.py, Drone.py, drone_2d_env.py), independently of the JAX
implementation under test.  scipy.optimize.fminbound gives the reference's
exact closest-point search behavior.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import fminbound


class OracleQPMI:
    """Quadratic path with membership blending; float64, scalar code."""

    def __init__(self, wps: np.ndarray):
        self.wps = np.asarray(wps, dtype=np.float64)
        d = np.diff(self.wps, axis=0)
        self.us = np.concatenate([[0.0], np.cumsum(np.hypot(d[:, 0], d[:, 1]))])
        self.length = self.us[-1]
        self.px, self.py = [], []
        for n in range(1, len(self.wps) - 1):
            U = np.array(
                [
                    [self.us[n - 1] ** 2, self.us[n - 1], 1.0],
                    [self.us[n] ** 2, self.us[n], 1.0],
                    [self.us[n + 1] ** 2, self.us[n + 1], 1.0],
                ]
            )
            self.px.append(np.linalg.solve(U, self.wps[n - 1 : n + 2, 0]))
            self.py.append(np.linalg.solve(U, self.wps[n - 1 : n + 2, 1]))

    def _idx(self, u: float) -> int:
        n = 0
        while n < len(self.us) - 1:
            if u <= self.us[n + 1]:
                break
            n += 1
        return n

    def __call__(self, u: float) -> np.ndarray:
        if self.us[0] <= u <= self.us[1]:
            p = (self.px[0], self.py[0])
        elif (self.us[-2] - 0.001 <= u <= self.us[-1]) or self._idx(u) == len(self.us) - 1:
            p = (self.px[-1], self.py[-1])
        else:
            n = self._idx(u)
            mu_r = (u - self.us[n]) / (self.us[n + 1] - self.us[n])
            mu_f = (self.us[n + 1] - u) / (self.us[n + 1] - self.us[n])
            x1 = np.polyval(self.px[n - 1], u)  # n-1 may be -1: Python wrap
            y1 = np.polyval(self.py[n - 1], u)
            x2 = np.polyval(self.px[n], u)
            y2 = np.polyval(self.py[n], u)
            return np.array([mu_r * x2 + mu_f * x1, mu_r * y2 + mu_f * y1])
        return np.array([np.polyval(p[0], u), np.polyval(p[1], u)])

    def gradient(self, u: float) -> np.ndarray:
        def dval(c, u):
            return 2 * c[0] * u + c[1]

        if self.us[0] <= u <= self.us[1]:
            return np.array([dval(self.px[0], u), dval(self.py[0], u)])
        if u >= self.us[-2]:
            return np.array([dval(self.px[-1], u), dval(self.py[-1], u)])
        n = self._idx(u)
        mu_r = (u - self.us[n]) / (self.us[n + 1] - self.us[n])
        mu_f = (self.us[n + 1] - u) / (self.us[n + 1] - self.us[n])
        return np.array(
            [
                mu_r * dval(self.px[n], u) + mu_f * dval(self.px[n - 1], u),
                mu_r * dval(self.py[n], u) + mu_f * dval(self.py[n - 1], u),
            ]
        )

    def direction_angle(self, u: float) -> float:
        g = self.gradient(u)
        return float(np.arctan2(g[1], g[0]))

    def closest_u(self, pos: np.ndarray, margin: float = 10.0) -> float:
        return float(
            fminbound(
                lambda u: np.linalg.norm(self(u) - pos),
                x1=-margin,
                x2=self.length + margin,
                xtol=1e-6,
                maxfun=500,
            )
        )

    def closest_position(self, pos: np.ndarray) -> np.ndarray:
        return self(self.closest_u(pos))

    def lookahead_point(self, pos: np.ndarray, dist: float) -> np.ndarray:
        u = self.closest_u(pos)
        return self(min(u + dist, self.length))


def oracle_body_step(pos, vel, angle, omega, fl, fr, *, dt=1 / 60, g=-1000.0,
                     mass=1.0, inertia=1501.6666666666667, arm=40.0):
    """Float64 composite-body step in Chipmunk order (position first)."""
    pos = np.asarray(pos, np.float64) + np.asarray(vel, np.float64) * dt
    new_angle = angle + omega * dt
    F = fl + fr
    fw = np.array([-np.sin(angle) * F, np.cos(angle) * F])
    vel = np.asarray(vel, np.float64) + (np.array([0.0, g]) + fw / mass) * dt
    omega = omega + arm * (fr - fl) / inertia * dt
    return pos, vel, new_angle, omega


def oracle_reward(obs, has_obs, collided, t_new, *, W=1300.0, H=1300.0,
                  n_steps=1100, danger_range=150.0, danger_angle=20.0,
                  inv_c=1 / 8, PA_band=40.0, PA_scale=2.0, PP_vel_scale=0.08,
                  PP_max=2.5, PP_min=-1.0, rew_collision=-50.0,
                  reach_r=20.0, rew_reach=30.0, AA_angle=np.pi / 2,
                  AA_band=np.pi / 4, rew_AA=-1.0, use_lambda=True):
    """Float64 reward oracle, straight from the published reward equations
    (reference drone_2d_env.py:422-572), independent of the JAX code."""
    obs = np.asarray(obs, np.float64)
    inv = lambda v, lo, hi: (v + 1) * (hi - lo) / 2 + lo
    diag = np.hypot(W, H)
    vel = np.hypot(inv(obs[0], -1330, 1330), inv(obs[1], -1330, 1330))
    alpha = obs[3] * np.pi
    tdx, tdy = inv(obs[4], 0, W), inv(obs[5], 0, H)
    pos = np.array([inv(obs[6], 0, W), inv(obs[7], 0, H)])
    vel_angle = (np.arctan2(obs[17] * np.pi, obs[18] * np.pi) + 2 * np.pi) % (2 * np.pi)
    cp = np.array([inv(obs[19], 0, W), inv(obs[20], 0, H)])
    la_angle = (np.arctan2(obs[23], obs[24]) + 2 * np.pi) % (2 * np.pi)

    lam_pa, lam_ca, ca = 1.0, 1.0, 0.0
    if has_obs:
        d = inv(obs[8], 0, diag)
        oa = (np.arctan2(obs[9], obs[10]) + 2 * np.pi) % (2 * np.pi)
        adiff = abs(np.rad2deg((oa - vel_angle + np.pi) % (2 * np.pi) - np.pi))
        if d < danger_range and use_lambda:
            lam_pa = max((d / danger_range) / 2, 0.10)
            lam_ca = 1 - lam_pa
        if d < danger_range:
            rr = -(((danger_range + inv_c * danger_range) / (d + inv_c * danger_range)) - 1)
            ar = -(((danger_angle + inv_c * danger_angle) / (adiff + inv_c * danger_angle)) - 1)
            ca = min(rr, 0.0) + min(ar, 0.0)

    dfp = np.linalg.norm(cp - pos)
    pa = -(2 * np.clip(dfp, 0, PA_band) / PA_band - 1) * PA_scale
    vld = abs((la_angle - vel_angle + np.pi) % (2 * np.pi) - np.pi)
    pp = np.clip(np.cos(vld) * vel * PP_vel_scale, PP_min, PP_max)
    coll = rew_collision if collided else 0.0
    end2 = abs(tdx) < reach_r and abs(tdy) < reach_r
    reach = rew_reach if end2 else 0.0
    aa = 0.0
    if alpha > AA_band:
        aa = -np.sin(alpha)
    if alpha < -AA_band:
        aa = np.sin(alpha)
    end5 = abs(alpha) >= AA_angle
    if end5:
        aa = rew_AA
    total = aa + pa * lam_pa + pp + coll + ca * lam_ca + reach
    done = collided or end2 or (t_new == n_steps) or end5
    return total, done
