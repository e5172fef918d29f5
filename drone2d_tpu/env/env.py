"""The drone environment as pure functions over fixed-shape pytrees.

Re-designs reference `drone_2d_custom_gym_env/drone_2d_env.py` (class
Drone2dEnv) TPU-first: instead of an object mutating a C physics world, the
world is an `EnvState` pytree and

    step:  (cfg, state, action)            -> StepOutput
    reset: (cfg, key, global_step)         -> (state, obs)

are pure, jit/vmap/scan-compatible functions.  `Drone2DEnv` is a thin config
binder exposing single-env and batched variants; auto-reset happens inside
the step via masked state selection (SB3's VecEnv auto-reset semantics).

Faithfulness notes (all line references into the reference file):
* observation layout and normalizations  <- get_observation (:631-773)
* reward terms and lambda blending       <- step (:457-572)
* termination conditions and info bus    <- step (:543-613)
* curriculum staging                     <- init_pymunk (:199-215, :324-373),
  driven by an explicit global_step instead of the checkpoint-filename glob
* test scenarios + spawn rectangles      <- init_pymunk (:218-311)
* reward math is computed from the *normalized observation round-trip*
  exactly as the reference does (step :422-445), preserving its numerics.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from drone2d_tpu.config import EnvConfig
from drone2d_tpu.env import scenarios
from drone2d_tpu.env.types import (
    EnvState, ObstacleSet, StepOutput, merge_state, split_state,
)
from drone2d_tpu.ops import geometry, path as jpath, physics
from drone2d_tpu.ops.transforms import invm1to1, m1to1, ssa

OBS_DIM = 27
ACT_DIM = 2


def _observe(
    cfg: EnvConfig,
    pd: jpath.PathData,
    obstacles: ObstacleSet,
    body: physics.BodyState,
    target: jnp.ndarray,
    la_locked: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """27-D observation (get_observation, drone_2d_env.py:631-773).

    Returns (obs, new_la_locked)."""
    w, h, diag = cfg.screensize_x, cfg.screensize_y, cfg.screen_diag
    x, y = body.pos[0], body.pos[1]
    alpha = body.angle

    vel_x = m1to1(body.vel[0], -cfg.vel_norm, cfg.vel_norm)
    vel_y = m1to1(body.vel[1], -cfg.vel_norm, cfg.vel_norm)
    omega = jnp.clip(body.omega / cfg.omega_norm, -1.0, 1.0)
    alpha_n = alpha / jnp.pi

    target_dx = m1to1(target[0] - x, 0.0, w)
    target_dy = m1to1(target[1] - y, 0.0, h)
    pos_x = m1to1(x, 0.0, w)
    pos_y = m1to1(y, 0.0, h)

    # --- k-nearest obstacles (:617-629, :660-720) --------------------------
    # TPU notes (measured at 4096 envs, docs/RESULTS.md): (a) slice obstacle
    # centers to separate x/y vectors once — (K, 2) arrays tile their minor
    # dim to 128 lanes; (b) lax.top_k is sort-based and cost ~90 ns/env-step
    # here, replaced by k unrolled argmin+mask passes; (c) all value lookups
    # are one-hot reductions, never batched 1-element gathers.
    verts = geometry.frame_vertices(
        body.pos, alpha, cfg.drone_width / 2, cfg.drone_height / 4
    )
    obs_x, obs_y = obstacles.xy[:, 0], obstacles.xy[:, 1]
    if obstacles.half_wh is None:  # circles-only fast path
        ddx = verts[:, 0:1] - obs_x[None, :]
        ddy = verts[:, 1:2] - obs_y[None, :]
        vdist = jnp.sqrt(ddx * ddx + ddy * ddy) - obstacles.r[None, :]
        d_all = jnp.min(vdist, axis=0)
    else:
        d_all = geometry.vertex_rounded_box_distances(
            verts, obstacles.xy, obstacles.half_wh, obstacles.r
        )
    d_masked = jnp.where(obstacles.mask, d_all, jnp.inf)
    n_obs = jnp.sum(obstacles.mask.astype(jnp.int32))
    k_obs = jnp.minimum(cfg.k_obs, n_obs)

    iota = jnp.arange(d_masked.shape[0])
    remaining = d_masked
    top_d_l, ox_l, oy_l = [], [], []
    for _ in range(cfg.k_obs):
        i = jnp.argmin(remaining)
        hit = iota == i
        top_d_l.append(jnp.sum(jnp.where(hit, remaining, 0.0)))
        ox_l.append(jnp.sum(jnp.where(hit, obs_x, 0.0)))
        oy_l.append(jnp.sum(jnp.where(hit, obs_y, 0.0)))
        remaining = jnp.where(hit, jnp.inf, remaining)
    top_d = jnp.stack(top_d_l)
    ox = jnp.stack(ox_l)
    oy = jnp.stack(oy_l)
    # bearing: ssa(atan2(y - y_o, x - x_o) - alpha - pi)  (:695-696)
    ang = ssa(jnp.arctan2(y - oy, x - ox) - alpha - jnp.pi)
    slot_valid = jnp.arange(cfg.k_obs) < k_obs
    obs_dist = jnp.where(slot_valid, m1to1(top_d, 0.0, diag), 1.0)
    obs_sin = jnp.where(slot_valid, jnp.sin(ang), 0.0)
    obs_cos = jnp.where(slot_valid, jnp.cos(ang), 0.0)

    # --- velocity angle in body frame (:722-727) ---------------------------
    vel_angle_b = ssa(jnp.arctan2(body.vel[1], body.vel[0]) - alpha)
    s_vel, c_vel = jnp.sin(vel_angle_b), jnp.cos(vel_angle_b)

    # --- path queries (:729-749); one closest-u search reused for both -----
    u_star = jpath.closest_u(
        pd, body.pos,
        golden_iters=cfg.golden_iters,
        fine_points=cfg.fine_refine_points,
    )
    cp = jpath.path_point(pd, u_star)
    la = jpath.lookahead_point_from_u(pd, u_star, cfg.lookahead)

    # lock the lookahead to the goal once within 10 px of it (:738-747)
    near_goal = (jnp.abs(la[0] - target[0]) < 10.0) & (jnp.abs(la[1] - target[1]) < 10.0)
    la_locked_new = la_locked | near_goal
    la = jnp.where(la_locked_new, target, la)

    cp_x = m1to1(cp[0], 0.0, w)
    cp_y = m1to1(cp[1], 0.0, h)
    la_x = m1to1(la[0], 0.0, w)
    la_y = m1to1(la[1], 0.0, h)

    # --- body-frame angles to lookahead / closest point (:751-763) ---------
    # replicates the reference's R_w_b(alpha) @ (p - pos) followed by an
    # extra "- alpha" (its own convention; kept verbatim for parity)
    def body_angle_to(p):
        rel = p - body.pos
        c, s = jnp.cos(alpha), jnp.sin(alpha)
        bx = c * rel[0] - s * rel[1]
        by = s * rel[0] + c * rel[1]
        return ssa(jnp.arctan2(by, bx) - alpha)

    la_ang = body_angle_to(la)
    cp_ang = body_angle_to(cp)

    obs = jnp.stack(
        [
            vel_x, vel_y,
            omega, alpha_n,
            target_dx, target_dy,
            pos_x, pos_y,
            obs_dist[0], obs_sin[0], obs_cos[0],
            obs_dist[1], obs_sin[1], obs_cos[1],
            obs_dist[2], obs_sin[2], obs_cos[2],
            s_vel, c_vel,
            cp_x, cp_y,
            la_x, la_y, jnp.sin(la_ang), jnp.cos(la_ang),
            jnp.sin(cp_ang), jnp.cos(cp_ang),
        ]
    ).astype(jnp.float32)
    return obs, la_locked_new


def _rewards_and_done(
    cfg: EnvConfig,
    obs: jnp.ndarray,
    has_obstacles: jnp.ndarray,
    collided: jnp.ndarray,
    t_new: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Reward assembly + terminations from the normalized observation
    round-trip, mirroring step (drone_2d_env.py:422-572) term by term."""
    w, h, diag = cfg.screensize_x, cfg.screensize_y, cfg.screen_diag

    vel_x = invm1to1(obs[0], -cfg.vel_norm, cfg.vel_norm)
    vel_y = invm1to1(obs[1], -cfg.vel_norm, cfg.vel_norm)
    alpha = obs[3] * jnp.pi
    target_dx = invm1to1(obs[4], 0.0, w)
    target_dy = invm1to1(obs[5], 0.0, h)
    pos = jnp.stack([invm1to1(obs[6], 0.0, w), invm1to1(obs[7], 0.0, h)])
    two_pi = 2 * jnp.pi
    vel_angle = (jnp.arctan2(obs[17], obs[18]) + two_pi) % two_pi
    cp = jnp.stack([invm1to1(obs[19], 0.0, w), invm1to1(obs[20], 0.0, h)])
    la_angle = (jnp.arctan2(obs[23], obs[24]) + two_pi) % two_pi

    # --- collision avoidance + lambda blending (:457-523) ------------------
    d_obs = invm1to1(obs[8], 0.0, diag)
    obs_angle = (jnp.arctan2(obs[9], obs[10]) + two_pi) % two_pi
    angle_diff = jnp.abs(
        jnp.rad2deg(((obs_angle - vel_angle + jnp.pi) % two_pi) - jnp.pi)
    )
    R, A = cfg.danger_range, cfg.danger_angle
    c = cfg.abs_inv_CA_min_rew
    in_range = d_obs < R
    lam_pa_raw = jnp.maximum((d_obs / R) / 2.0, 0.10)
    use_lam = has_obstacles & in_range & bool(cfg.use_Lambda)
    lambda_pa = jnp.where(use_lam, lam_pa_raw, 1.0)
    lambda_ca = jnp.where(use_lam, 1.0 - lam_pa_raw, 1.0)

    range_rew = jnp.minimum(-((R + c * R) / (d_obs + c * R) - 1.0), 0.0)
    angle_rew = jnp.minimum(-((A + c * A) / (angle_diff + c * A) - 1.0), 0.0)
    rew_ca = jnp.where(has_obstacles & in_range, range_rew + angle_rew, 0.0)

    # --- path adherence (:527-530) ------------------------------------------
    dist_from_path = jnp.sqrt(jnp.sum((cp - pos) ** 2))
    rew_pa = (
        -(2.0 * jnp.clip(dist_from_path, 0.0, cfg.PA_band_edge) / cfg.PA_band_edge - 1.0)
        * cfg.PA_scale
    )

    # --- path progression (:534-539) ----------------------------------------
    speed = jnp.sqrt(vel_x**2 + vel_y**2)
    vel_la_diff = jnp.abs(((la_angle - vel_angle + jnp.pi) % two_pi) - jnp.pi)
    rew_pp = jnp.clip(
        jnp.cos(vel_la_diff) * speed * cfg.PP_vel_scale, cfg.PP_rew_min, cfg.PP_rew_max
    )

    # --- collision (:543-547) ------------------------------------------------
    end1 = collided
    rew_coll = jnp.where(end1, cfg.rew_collision, 0.0)

    # --- reach end (:550-554) ------------------------------------------------
    end2 = (jnp.abs(target_dx) < cfg.reach_end_radius) & (
        jnp.abs(target_dy) < cfg.reach_end_radius
    )
    rew_reach = jnp.where(end2, cfg.rew_reach_end, 0.0)

    # --- aggressive alpha (:556-565) ------------------------------------------
    rew_aa = jnp.where(alpha > cfg.AA_band, -jnp.sin(alpha), 0.0)
    rew_aa = jnp.where(alpha < -cfg.AA_band, jnp.sin(alpha), rew_aa)
    end5 = jnp.abs(alpha) >= cfg.AA_angle
    rew_aa = jnp.where(end5, cfg.rew_AA, rew_aa)

    # --- timeout (:567-570) ----------------------------------------------------
    end4 = t_new == cfg.n_steps

    reward = (
        rew_aa
        + rew_pa * lambda_pa
        + rew_pp
        + rew_coll
        + rew_ca * lambda_ca
        + rew_reach
    )
    done = end1 | end2 | end4 | end5

    return dict(
        reward=reward,
        rew_ca=rew_ca * lambda_ca,
        rew_pa=rew_pa * lambda_pa,
        rew_pp=rew_pp,
        rew_coll=rew_coll,
        rew_reach=rew_reach,
        rew_aa=rew_aa,
        dist_from_path=dist_from_path,
        d_obs=d_obs,
        done=done,
        end1=end1,
        end2=end2,
        end4=end4,
        end5=end5,
    )


class Drone2DEnv:
    """Config binder.  All methods are pure functions of their arguments;
    wrap them in jit/vmap/scan freely (cfg is static via closure)."""

    def __init__(self, cfg: EnvConfig):
        if cfg.mode not in ("curriculum", "test"):
            raise ValueError(f"mode must be 'curriculum' or 'test', got {cfg.mode!r}")
        if cfg.mode == "test" and cfg.scenario not in scenarios._SPAWN_RECTS:
            raise ValueError(
                f"test mode needs a spatial scenario, got {cfg.scenario!r} "
                "(stage_k scenarios run under mode='curriculum', as in the "
                "reference: drone_2d_env.py:76-77, 326-372)"
            )
        self.cfg = cfg
        self.obs_dim = OBS_DIM
        self.act_dim = ACT_DIM

        self._stage_override: Optional[int] = None
        if cfg.scenario.startswith("stage_"):
            self._stage_override = int(cfg.scenario.split("_")[1])

        if cfg.mode == "test":
            geo = scenarios.build_test_scenario(cfg)
            self._test_path = jpath.make_path(
                jnp.asarray(geo.wps),
                jnp.int32(geo.n_wps),
                table_n=cfg.path_table_n,
                margin=cfg.closest_u_margin,
            )
            self._test_obstacles = ObstacleSet(
                xy=jnp.asarray(geo.obs_xy),
                r=jnp.asarray(geo.obs_r),
                mask=jnp.asarray(geo.obs_mask),
                half_wh=None if geo.obs_half_wh is None
                else jnp.asarray(geo.obs_half_wh),
            )
            self._spawn_rect = jnp.asarray(geo.spawn_rect)

    # -- reset ---------------------------------------------------------------

    def reset(
        self,
        key: jax.Array,
        global_step=0,
        rehearsal_probs: Optional[jnp.ndarray] = None,
    ) -> Tuple[EnvState, jnp.ndarray]:
        """Fresh episode.  `rehearsal_probs` (traced (7,): stage_1..stage_5,
        corridor, cross) drives per-episode family sampling when
        cfg.adaptive_rehearsal is set — probabilities are DATA, so a PLR-lite
        controller can reweight them between updates without recompiling."""
        cfg = self.cfg
        if cfg.adaptive_rehearsal and rehearsal_probs is None and cfg.mode != "test":
            raise ValueError(
                "cfg.adaptive_rehearsal=True requires rehearsal_probs"
            )
        k_path, k_obs, k_sx, k_sy, k_ang, k_throw, k_mix = jax.random.split(key, 7)
        angle = jax.random.uniform(k_ang, (), minval=-jnp.pi / 4, maxval=jnp.pi / 4)
        family = jnp.int32(0)

        if cfg.mode == "test":
            pd = self._test_path
            obstacles = self._test_obstacles
            xmin, ymin, xmax, ymax = self._spawn_rect
            x = jax.random.uniform(k_sx, (), minval=xmin, maxval=xmax)
            y = jax.random.uniform(k_sy, (), minval=ymin, maxval=ymax)
            pos = jnp.stack([x, y])
        else:
            wps = scenarios.random_corner_waypoints(k_path, cfg)
            pd = jpath.make_path(
                wps,
                jnp.int32(cfg.n_wps),
                table_n=cfg.path_table_n,
                margin=cfg.closest_u_margin,
            )
            if self._stage_override is not None:
                stage = jnp.int32(self._stage_override)
                gs = jnp.float32(-1.0)  # reference sim_num = -1 for forced stages
            else:
                scaled = jnp.asarray(global_step, jnp.float32) / cfg.curriculum_scale
                stage = scenarios.stage_from_step(scaled)
                gs = scaled
                if cfg.adaptive_rehearsal:
                    # PLR-lite family draw: one categorical over the 7
                    # rehearsal families (stage_1..5, corridor, cross) with
                    # the remainder a scheduled-curriculum episode.  Uses its
                    # own fold_in keys so the static path's RNG streams (and
                    # the committed golden fixtures) stay bit-identical.
                    u = jax.random.uniform(jax.random.fold_in(key, 11))
                    cum = jnp.cumsum(rehearsal_probs)
                    fam_idx = jnp.sum((u >= cum).astype(jnp.int32))  # 0..7
                    is_stage = fam_idx <= 4
                    stage = jnp.where(is_stage, fam_idx + 1, stage)
                    gs = jnp.where(is_stage, jnp.float32(-1.0), gs)
                    family = jnp.where(is_stage, fam_idx + 1, 0).astype(jnp.int32)
                elif cfg.stage_mix_prob > 0.0:
                    # stage rehearsal: see EnvConfig.stage_mix_prob
                    k_flip, k_stage = jax.random.split(k_mix)
                    mix = jax.random.bernoulli(k_flip, cfg.stage_mix_prob)
                    rand_stage = jax.random.randint(k_stage, (), 1, 6)
                    stage = jnp.where(mix, rand_stage, stage)
                    gs = jnp.where(mix, jnp.float32(-1.0), gs)
                    family = jnp.where(mix, rand_stage, 0).astype(jnp.int32)
            oxy, orad, omask = scenarios.curriculum_obstacles(k_obs, cfg, pd, stage, gs)
            corridor_mix = jnp.asarray(False)
            # rehearsal mixes are TRAINING-time data augmentation: like
            # stage_mix above they must never fire under a forced-stage
            # eval scenario (scenario='stage_k'), or per-stage benchmark
            # measurements would silently include rehearsal episodes
            # rehearsal guards: static mixes need the no-override check
            # explicitly; `adaptive` already entails it
            adaptive = cfg.adaptive_rehearsal and self._stage_override is None
            corridor_on = adaptive or (
                cfg.corridor_mix_prob > 0.0 and self._stage_override is None
            )
            cross_on = adaptive or (
                cfg.cross_mix_prob > 0.0 and self._stage_override is None
            )
            if corridor_on:
                # corridor rehearsal: see EnvConfig.corridor_mix_prob.  Keys
                # fold_in-derived so the default path's RNG streams (and the
                # committed golden fixtures) stay bit-identical.
                k_cflip = jax.random.fold_in(key, 7)
                k_cor = jax.random.fold_in(key, 8)
                if adaptive:
                    corridor_mix = fam_idx == 5
                else:
                    corridor_mix = jax.random.bernoulli(k_cflip, cfg.corridor_mix_prob)
                cxy, cr, cmask = scenarios.corridor_obstacles(k_cor, cfg, pd)
                oxy = jnp.where(corridor_mix, cxy, oxy)
                orad = jnp.where(corridor_mix, cr, orad)
                omask = jnp.where(corridor_mix, cmask, omask)
            cross_mix = jnp.asarray(False)
            if cross_on:
                # crossing-wall rehearsal: see EnvConfig.cross_mix_prob.
                # fold_in keys 9/10 keep the default path's RNG streams (and
                # golden fixtures) bit-identical; when both rehearsals fire
                # in one episode the crossing wall wins.
                k_xflip = jax.random.fold_in(key, 9)
                k_cross = jax.random.fold_in(key, 10)
                if adaptive:
                    cross_mix = fam_idx == 6
                else:
                    cross_mix = jax.random.bernoulli(k_xflip, cfg.cross_mix_prob)
                xxy, xr, xmask = scenarios.cross_obstacles(k_cross, cfg, pd)
                oxy = jnp.where(cross_mix, xxy, oxy)
                orad = jnp.where(cross_mix, xr, orad)
                omask = jnp.where(cross_mix, xmask, omask)
            obstacles = ObstacleSet(xy=oxy, r=orad, mask=omask)
            family = jnp.where(corridor_mix, 6, family).astype(jnp.int32)
            family = jnp.where(cross_mix, 7, family).astype(jnp.int32)
            # stage 2 spawns anywhere on screen (:329-333); others at path start
            rx = jax.random.uniform(k_sx, (), minval=100.0, maxval=cfg.screensize_x - 100.0)
            ry = jax.random.uniform(k_sy, (), minval=100.0, maxval=cfg.screensize_y - 100.0)
            start = pd.wps[0]
            pos = jnp.where(stage == 2, jnp.stack([rx, ry]), start)
            # corridor episodes must start inside the corridor, not in a
            # wall; crossing-wall episodes start at the path start so the
            # wall is ahead of the drone
            pos = jnp.where(corridor_mix | cross_mix, start, pos)

        target = pd.wps[pd.n_wps - 1]
        body = physics.BodyState(
            pos=pos.astype(jnp.float32),
            vel=jnp.zeros(2, jnp.float32),
            angle=angle.astype(jnp.float32),
            omega=jnp.float32(0.0),
        )

        if cfg.initial_motion_enabled:
            body = self._initial_motion(k_throw, body)

        state = EnvState(
            path=pd,
            obstacles=obstacles,
            body=body,
            target=target.astype(jnp.float32),
            t=jnp.int32(0),
            path_error=jnp.float32(0.0),
            total_reward=jnp.float32(0.0),
            la_locked=jnp.asarray(False),
            left_force=jnp.float32(0.0),
            right_force=jnp.float32(0.0),
            family=family,
        )
        obs, la_locked = _observe(cfg, pd, obstacles, body, state.target, state.la_locked)
        return state._replace(la_locked=la_locked), obs

    def _initial_motion(self, key: jax.Array, body: physics.BodyState) -> physics.BodyState:
        """Optional random throw + settle (initial_movement,
        drone_2d_env.py:917-946; defined-but-never-called in the reference,
        so gated behind cfg.initial_motion_enabled)."""
        cfg = self.cfg
        ka, kf, kr = jax.random.split(key, 3)
        if cfg.initial_throw:
            throw_angle = jax.random.uniform(ka, ()) * 2 * jnp.pi
            throw_force = jax.random.uniform(kf, (), minval=0.0, maxval=1500.0)
            rot = jax.random.uniform(kr, (), minval=-3000.0, maxval=3000.0)
            f_world = throw_force * jnp.stack([jnp.cos(throw_angle), jnp.sin(throw_angle)])
            # one step with throw force + rotation couple (net torque -2*arm*rot)
            g = jnp.array([0.0, cfg.gravity_y])
            pos = body.pos + body.vel * cfg.physics_dt
            angle = body.angle + body.omega * cfg.physics_dt
            vel = body.vel + (g + f_world / cfg.total_mass) * cfg.physics_dt
            torque = -2.0 * cfg.drone_radius * rot
            omega = body.omega + torque / cfg.moment_of_inertia * cfg.physics_dt
            body = physics.BodyState(pos=pos, vel=vel, angle=angle, omega=omega)
        settle = partial(
            physics.free_step_body, dt=cfg.physics_dt, gravity_y=cfg.gravity_y
        )
        return jax.lax.fori_loop(0, cfg.n_fall_steps, lambda _, b: settle(b), body)

    # -- step ----------------------------------------------------------------

    def step(self, state: EnvState, action: jnp.ndarray) -> StepOutput:
        """One env step WITHOUT auto-reset (drone_2d_env.py:394-615)."""
        cfg = self.cfg
        forces = physics.thrust_forces(jnp.asarray(action, jnp.float32), cfg.force_scale)
        body = physics.step_body(
            state.body,
            forces[0],
            forces[1],
            dt=cfg.physics_dt,
            gravity_y=cfg.gravity_y,
            mass=cfg.total_mass,
            inertia=cfg.moment_of_inertia,
            arm=cfg.drone_radius,
        )
        if state.obstacles.half_wh is None:  # circles-only fast path
            collided = geometry.any_collision(
                body.pos,
                body.angle,
                cfg.drone_width / 2,
                cfg.drone_height / 4,
                state.obstacles.xy,
                state.obstacles.r,
                state.obstacles.mask,
            )
        else:
            collided = geometry.any_collision_mixed(
                body.pos,
                body.angle,
                cfg.drone_width / 2,
                cfg.drone_height / 4,
                state.obstacles.xy,
                state.obstacles.r,
                state.obstacles.half_wh,
                state.obstacles.mask,
            )
        t_new = state.t + 1

        obs, la_locked = _observe(
            cfg, state.path, state.obstacles, body, state.target, state.la_locked
        )
        has_obstacles = jnp.any(state.obstacles.mask)
        r = _rewards_and_done(cfg, obs, has_obstacles, collided, t_new)

        path_error = state.path_error + r["dist_from_path"]
        total_reward = state.total_reward + r["reward"]
        done = r["done"]

        new_state = state._replace(
            body=body,
            t=t_new,
            path_error=path_error,
            total_reward=total_reward,
            la_locked=la_locked,
            left_force=forces[0],
            right_force=forces[1],
        )

        # info bus (drone_2d_env.py:575-613); episode-end fields are zero
        # until done, as in the reference
        ape = path_error / jnp.maximum(t_new.astype(jnp.float32), 1.0)
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        info = {
            "reward": f32(r["reward"]),
            "collision_avoidance_reward": f32(r["rew_ca"]),
            "path_adherence": f32(r["rew_pa"]),
            "path_progression": f32(r["rew_pp"]),
            "collision_reward": f32(r["rew_coll"]),
            "reach_end_reward": f32(r["rew_reach"]),
            "agressive_alpha_reward": f32(r["rew_aa"]),
            "dist_closest_obs": jnp.where(has_obstacles, f32(r["d_obs"]), jnp.inf),
            "env_steps": t_new,
            "APE": jnp.where(done, ape, 0.0),
            "n_collisions": jnp.where(
                r["end1"] & ~(r["end2"] | r["end4"] | r["end5"]), 1, 0
            ),
            "n_successful_runs": jnp.where(r["end2"], 1, 0),
            "n_failed_runs": jnp.where(r["end1"] | r["end4"] | r["end5"], 1, 0),
            "total_reward": jnp.where(done, f32(total_reward), 0.0),
            # MDP-terminal end (collision / reach-end / AA-angle) as opposed
            # to the step-cap truncation end4 — lets gymnasium adapters report
            # terminated vs truncated correctly even when both fire at once
            "terminal": jnp.where(r["end1"] | r["end2"] | r["end5"], 1, 0),
        }
        return StepOutput(
            state=new_state,
            obs=obs,
            reward=f32(r["reward"]),
            done=done,
            info=info,
        )

    def step_autoreset(
        self, state: EnvState, action: jnp.ndarray, reset_key: jax.Array, global_step=0
    ) -> StepOutput:
        """Step with SB3-style auto-reset: when done, the returned state/obs
        are a freshly reset episode (info still reports the finished one)."""
        out = self.step(state, action)
        reset_state, reset_obs = self.reset(reset_key, global_step)
        # scalar done broadcasts against every state leaf
        new_state = jax.tree.map(
            lambda a, b: jnp.where(out.done, b, a), out.state, reset_state
        )
        new_obs = jnp.where(out.done, reset_obs, out.obs)
        return out._replace(state=new_state, obs=new_obs)

    def step_autoreset_template(
        self, state: EnvState, action: jnp.ndarray, reset_state: EnvState,
        reset_obs: jnp.ndarray,
    ) -> StepOutput:
        """Auto-resetting step against a PRECOMPUTED reset target.

        TPU hot-loop variant of `step_autoreset`: episode construction
        (waypoint chain, quadratic fit, 512-entry arc table, obstacle
        rejection sampling) is ~100x the cost of a physics step, so
        regenerating it inside the scanned step — as the reference does by
        rebuilding its pymunk world every reset (drone_2d_env.py:908-912) —
        would dominate the program.  Instead the learner resets a fresh
        template batch ONCE per rollout (amortized over n_steps) and the
        in-scan step just selects it on done.  An env that finishes twice
        within one rollout window restarts the same episode geometry; the
        reference redraws it, but at n_steps >= 128 the refresh rate is
        statistically equivalent for training.
        """
        out = self.step(state, action)
        new_state = jax.tree.map(
            lambda a, b: jnp.where(out.done, b, a), out.state, reset_state
        )
        new_obs = jnp.where(out.done, reset_obs, out.obs)
        return out._replace(state=new_state, obs=new_obs)

    def step_autoreset_split(
        self,
        dyn,
        fresh: jnp.ndarray,
        action: jnp.ndarray,
        init_static,
        tmpl_static,
        tmpl_dyn,
        tmpl_obs: jnp.ndarray,
    ):
        """Split-carry auto-resetting step (the TPU hot-loop fast path).

        Identical semantics to `step_autoreset_template`, re-factored around
        the observation (docs/RESULTS.md roofline) that the done-select over
        the FULL carry costs 9.1 of the 60 ns/env-step, almost all of it
        rewriting per-episode constants (512-entry path table, obstacles,
        waypoints/coefs) that `step` never touches.  Here the scan carries
        only the mutated leaves (`EpisodeDyn`, ~15 scalars) plus one `fresh`
        bit per env meaning "this env has auto-reset at least once this
        chunk"; the constants are blended at read time,

            static_t = where(fresh_t, template, initial),

        from two loop-invariant operands that XLA fuses into the consumers
        instead of round-tripping through the carry.  By induction
        `static_t` equals the carried value in the template variant, so the
        two loops are bit-exact (tests/test_env.py::test_split_carry_bitexact).

        CONTRACT — end of chunk: the statics are never written during the
        loop, so when a caller stops scanning it must materialize the real
        EnvState with ONE final blend, `types.finalize_split(init_static,
        tmpl_static, fresh, dyn)`, before starting the next chunk against a
        new template (and reset `fresh` to False).  Skipping that blend
        resurrects pre-reset geometry for every env that finished an episode
        during the chunk.

        Returns (new_dyn, new_fresh, new_obs, reward, done, info).
        """
        static = jax.tree.map(
            lambda a, b: jnp.where(fresh, b, a), init_static, tmpl_static
        )
        out = self.step(merge_state(static, dyn), action)
        stepped_dyn = split_state(out.state)[1]
        new_dyn = jax.tree.map(
            lambda a, b: jnp.where(out.done, b, a), stepped_dyn, tmpl_dyn
        )
        new_obs = jnp.where(out.done, tmpl_obs, out.obs)
        return new_dyn, fresh | out.done, new_obs, out.reward, out.done, out.info

    def step_batch_split(
        self, dyn, fresh, action, init_static, tmpl_static, tmpl_dyn, tmpl_obs
    ):
        """Batched split-carry step; statics/templates carry the env dim."""
        return jax.vmap(
            self.step_autoreset_split, in_axes=(0, 0, 0, 0, 0, 0, 0)
        )(dyn, fresh, action, init_static, tmpl_static, tmpl_dyn, tmpl_obs)

    # -- batched helpers -------------------------------------------------------

    def reset_batch(self, key: jax.Array, num_envs: int, global_step=0,
                    rehearsal_probs=None):
        keys = jax.random.split(key, num_envs)
        return jax.vmap(lambda k: self.reset(k, global_step, rehearsal_probs))(keys)

    def step_batch(self, state, action, key: jax.Array, global_step=0):
        """Batched auto-resetting step; state/action carry a leading env dim."""
        n = action.shape[0]
        keys = jax.random.split(key, n)
        return jax.vmap(
            lambda s, a, k: self.step_autoreset(s, a, k, global_step)
        )(state, action, keys)

    def step_batch_template(self, state, action, reset_state, reset_obs):
        """Batched auto-resetting step against a precomputed reset batch."""
        return jax.vmap(self.step_autoreset_template)(
            state, action, reset_state, reset_obs
        )
