"""Configuration for the environment, learner, and runtime.

Mirrors every knob of the reference's plain-dict config
(`drone_2d_custom_gym_env/rl_config.py:5-44`) as typed, hashable dataclasses
so they can be closed over by `jax.jit` as static configuration.  Defaults are
the reference's committed values.

The reference also carries four render-related host-side flags
(render_sim/render_path/render_shade/render_text); those never touch the
device path here — rendering is a host-side replay of logged trajectories
(`drone2d_tpu.eval.render`) — but the flags are preserved for API parity.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

# Scenario name registry (reference `rl_config.py:45-58`).
TEST_SCENARIOS: Tuple[str, ...] = (
    "perpendicular",
    "parallel",
    "S_parallel",
    "corridor",
    "S_corridor",
    "large",
    "impossible",
)
STAGE_SCENARIOS: Tuple[str, ...] = (
    "stage_1",
    "stage_2",
    "stage_3",
    "stage_4",
    "stage_5",
)
ALL_SCENARIOS: Tuple[str, ...] = TEST_SCENARIOS + STAGE_SCENARIOS
# Framework-only extras, NOT part of the published 12-scenario suite:
# 'parallel_boxes' exercises the Square/Rectangle box-obstacle port
# (reference obstacles.py:20-45 — dead in its live path).
EXTRA_SCENARIOS: Tuple[str, ...] = ("parallel_boxes",)


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """All environment knobs.

    Field-by-field source: reference `rl_config.py:10-44` (env_train_config)
    and `drone_2d_env.py:33-67` (kwargs unpacking).
    """

    # --- host-side render flags (API parity; device path ignores them) ---
    render_sim: bool = False
    render_path: bool = False
    render_shade: bool = False
    render_text: bool = False
    shade_distance: float = 75.0

    # --- episode / physics ---
    n_steps: int = 1100            # max episode steps (rl_config.py:16)
    n_fall_steps: int = 5          # settle steps for optional initial motion
    change_target: bool = False    # mouse retarget (host debug mode only)
    initial_throw: bool = True     # kwarg parity; see initial_motion_enabled
    # The reference defines initial_movement() but never calls it
    # (drone_2d_env.py:917-946), so throw/settle are inert there.  This master
    # gate keeps our default behavior identical; set True to actually enable.
    initial_motion_enabled: bool = False

    # --- path generation ---
    random_path_spawn: bool = True
    path_segment_length: float = 100.0
    n_wps: int = 12
    screensize_x: float = 1300.0
    screensize_y: float = 1300.0
    lookahead: float = 220.0
    spawn_corners: Tuple[int, int] = (1, 4)  # (DL, DR, UL, UR) index range

    # --- reward shaping ---
    danger_range: float = 150.0
    danger_angle: float = 20.0            # degrees
    abs_inv_CA_min_rew: float = 1.0 / 8.0
    PA_band_edge: float = 40.0
    PA_scale: float = 2.0
    PP_vel_scale: float = 0.08
    PP_rew_max: float = 2.5
    PP_rew_min: float = -1.0
    rew_collision: float = -50.0
    reach_end_radius: float = 20.0
    rew_reach_end: float = 30.0
    AA_angle: float = math.pi / 2
    AA_band: float = math.pi / 4
    rew_AA: float = -1.0
    use_Lambda: bool = True

    # --- mode / scenario ---
    mode: str = "curriculum"       # 'curriculum' or 'test'
    scenario: str = "large"        # one of ALL_SCENARIOS, or 'None'
    # Stage boundaries (drone_2d_env.py:326-362) are ABSOLUTE step counts
    # sized for the reference's 9M-step budget; training N x longer would
    # blow through the obstacle-intro stages in 9/N of the run.  This factor
    # stretches the schedule (stage_from_step(step / scale)); set to
    # total_timesteps/9e6 to keep the reference's stage proportions.
    curriculum_scale: float = 1.0
    # Stage rehearsal (framework knob, not in the reference): with this
    # per-episode probability, train on a uniformly random stage 1..5
    # (forced-stage semantics, as the stage_k eval scenarios use) instead of
    # the scheduled stage.  The reference trains >78% of its budget at
    # stage 5 yet publishes per-stage success rates (barplots.py:19-29);
    # rehearsal keeps the early-stage distributions (random spawn, single
    # near-/on-path obstacle) in the data mix so the final agent doesn't
    # forget them.  0.0 = reference schedule exactly.
    stage_mix_prob: float = 0.0
    # Corridor rehearsal (framework knob, not in the reference): with this
    # per-episode probability, replace the scheduled stage's obstacle field
    # with corridor WALLS along the episode's random path — two rows of
    # touching circles at a random lateral offset, the obstacle family of
    # the corridor/S_corridor eval scenarios (test_scenarios.py:169-246)
    # generalized to random training paths.  The reference curriculum never
    # trains wall-structured fields (only isolated near-/on-path circles),
    # which leaves corridor-following under-trained.  0.0 = off.
    corridor_mix_prob: float = 0.0

    # Probability that a curriculum episode rehearses a CROSSING WALL: a row
    # of touching circles perpendicular to the episode's random path at a
    # random arc-length, the obstacle family of the perpendicular eval
    # scenario (test_scenarios.py:4-30 perpendicular branch) generalized to
    # random paths, radii, and lateral centering — trains the
    # fly-around-the-wall-end maneuver that corridor rehearsal crowds out
    # (docs/RESULTS.md hunt 7).  0.0 = off.
    cross_mix_prob: float = 0.0

    # Relative weights splitting stage_mix_prob across the five rehearsed
    # stages (framework knob; default = the original uniform split).  The
    # published stage_1 = 1.00 (barplots.py:22) demands a true success rate
    # ~0.999+, and the known stage_1 failure mode is a slow-flight timeout
    # attractor (docs/RESULTS.md) — weighting stage_1's rehearsal share up
    # puts more gradient signal on finishing open-path episodes fast.
    # Weights are normalized; they reshape the (7,) family categorical the
    # adaptive reset path takes as DATA, so hunts over weight settings reuse
    # one compiled program.  Non-uniform weights therefore require
    # adaptive_rehearsal=True (enforced in learn/ppo.py); the static
    # stage-mix path keeps its uniform in-jit draw (and its golden RNG
    # streams) untouched.
    stage_mix_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 1.0)

    # PLR controller gate: with adaptive_rehearsal=True the reset path reads
    # rehearsal probabilities as data; this host-side flag says whether the
    # training loop's PLR-lite controller (learn/plr.py) actually reweights
    # them between updates.  False = the probabilities stay FIXED at their
    # stage_mix_weights initialization — a static weighted mix that shares
    # the adaptive path's compiled program (no recompile per weight setting).
    rehearsal_adapt: bool = True

    # Adaptive (PLR-lite) rehearsal: when True, the three fixed mix
    # probabilities above are replaced by a PER-EPISODE categorical over the
    # 7 rehearsal families (stage_1..stage_5, corridor, cross) whose
    # probabilities are DATA — a (7,) array threaded through reset from
    # TrainState.rehearsal_probs — so a controller can reweight families
    # toward the ones the agent is currently failing (success accounting is
    # kept on device per family; see learn/plr.py) without recompiling.
    # The static path (False) is bit-identical to before this knob existed.
    adaptive_rehearsal: bool = False

    # --- framework capacity knobs (fixed shapes; not in the reference) ---
    max_wps: int = 16              # ≥ any scenario's waypoint count (large: 14)
    max_obs: int = 64              # ≥ any scenario's obstacle count (S_corridor: 58)
    max_curriculum_obs: int = 18   # cap for stage-5 n~N(1,4) draw (≈+4σ)
    # closest-point search (ops/path.py closest_u): a dense arc table of
    # path_table_n samples + parabolic refine.  fine_refine_points=0 refines
    # directly on the table (pair with a fine table); R>0 rescans the winning
    # bracket with R parallel path evals (allows a 4x coarser table).
    # golden_iters>0 switches to fminbound-tight golden-section (parity runs).
    # Defaults (512-sample table + 17-point rescan) are the benchmarked
    # fast-and-accurate hot-loop config; 2048+5 trades table build time for
    # slightly cheaper steps and suits long-episode eval runs.
    path_table_n: int = 512
    fine_refine_points: int = 17
    golden_iters: int = 0
    obstacle_attempts: int = 8     # rejection-sampling attempts per obstacle
    # curriculum obstacle radius range (reference obstacles.py:74: U(10,50));
    # widen for generalization to big obstacles like the 'large' scenario
    obstacle_radius_min: float = 10.0
    obstacle_radius_max: float = 50.0

    # --- physics constants (reference hard-codes; drone_2d_env.py / Drone.py) ---
    gravity_y: float = -1000.0     # drone_2d_env.py:185
    physics_dt: float = 1.0 / 60.0 # drone_2d_env.py:406
    force_scale: float = 1000.0    # drone_2d_env.py:150
    drone_height: float = 20.0     # Drone(x, y, angle, 20, 100, ...) ctor args
    drone_width: float = 100.0
    mass_frame: float = 0.2
    mass_motor: float = 0.4
    vel_norm: float = 1330.0       # drone_2d_env.py:635 velocity normalizer
    omega_norm: float = 11.7       # drone_2d_env.py:640
    k_obs: int = 3                 # drone_2d_env.py:67 observed obstacle count
    closest_u_margin: float = 10.0 # predef_path.py:243-244 search margin

    # derived geometry -----------------------------------------------------
    @property
    def drone_radius(self) -> float:
        """Motor-arm half-span: width/2 - height/2 = 40 (Drone.py:11)."""
        return self.drone_width / 2 - self.drone_height / 2

    @property
    def total_mass(self) -> float:
        return self.mass_frame + 2 * self.mass_motor

    @property
    def moment_of_inertia(self) -> float:
        """Composite moment of the rigid 3-box multibody about its COM.

        The reference ties frame + two motor boxes with six zero-error-bias
        pivot joints (Drone.py:60-95) — rigid in the limit — so the multibody
        collapses to one rigid body.  Box moment about own COM is
        m*(w^2+h^2)/12 (pymunk.moment_for_poly for create_box); motors get a
        parallel-axis term m*d^2 at d = drone_radius.
        """
        w, h = self.drone_width, self.drone_height
        i_frame = self.mass_frame * (w * w + (h / 2) * (h / 2)) / 12.0
        i_motor_own = self.mass_motor * (h * h + h * h) / 12.0
        i_motor = i_motor_own + self.mass_motor * self.drone_radius**2
        return i_frame + 2 * i_motor

    @property
    def screen_diag(self) -> float:
        return math.hypot(self.screensize_x, self.screensize_y)

    def replace(self, **kw) -> "EnvConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """PPO hyperparameters.

    Defaults mirror SB3 `PPO("MlpPolicy", ...)` as invoked by the reference
    (`main.py:200`): all SB3 defaults except ent_coef=0.01
    (`rl_config.py:7`).  n_steps here is the per-env rollout horizon; with
    thousands of on-chip envs the SB3 default of 2048 would be wasteful, so
    the batched default is 128 (SB3 parity mode can set 2048).
    """

    learning_rate: float = 3e-4
    n_steps: int = 128
    num_minibatches: int = 8
    n_epochs: int = 10
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: float = 0.2
    ent_coef: float = 0.01
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    # policy net: SB3 MlpPolicy default = separate pi/vf MLPs, 2x64 tanh,
    # orthogonal init, state-independent log_std initialized to 0.
    hidden_sizes: Tuple[int, ...] = (64, 64)
    # minibatch shuffle: 'exact' = uniform random permutation per epoch (SB3
    # semantics; the per-minibatch random-row gather dominates the SGD
    # phase); 'affine' = random affine index bijection (sort-free; same
    # gather cost); 'timeperm' = gather-free: permute only the time axis
    # per epoch and slice contiguous minibatches (each = all envs at
    # n_steps/num_minibatches random timesteps; needs n_steps %
    # num_minibatches == 0).  See learn/ppo.py and docs/RESULTS.md for the
    # measured throughput and quality parity.
    shuffle: str = "exact"

    def replace(self, **kw) -> "PPOConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-run configuration (reference `rl_config.py:5-8` + main.py)."""

    total_timesteps: int = 9_000_000   # rl_config.py:6
    num_envs: int = 4096
    seed: int = 0
    checkpoint_every_steps: int = 100_000  # main.py:161 save_freq semantics
    log_every_updates: int = 1
    checkpoint_dir: str = "logs"
    metrics_path: str = "logs/metrics.jsonl"

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


# --- Published training recipes as first-class presets (VERDICT r4 #3) ----
#
# The reference ships its best configs verbatim
# (best_models_config_and_res/run17see3/{rl_config,env_train_config}.txt);
# these presets are the rebuild's equivalent: the exact recipes behind the
# shipped strict-dominance agents (docs/RESULTS.md rounds 3-4), selectable
# as `--preset NAME` on drone2d_tpu.train and scripts/sweep.py.  Explicit
# CLI flags override preset values.  The committed per-knob defaults above
# deliberately stay at REFERENCE values (conformance first); the presets
# carry the quality deltas.
PRESETS: dict = {
    # Hunt-7 from-scratch recipe: 24 seeds x 150M of this + selection
    # produced three strict n=1000-dominance finalists (stage_1 3000/3000,
    # means 0.849-0.856) with no warm start (docs/RESULTS.md round 4).
    # Train a pool of seeds (sweep.py --vmap 8), then pick with
    # scripts/select_agents.py: expect large seed variance (the reference
    # hand-picked from ~20 runs the same way).
    "flagship-scratch": dict(
        doc="published-quality from-scratch recipe (hunt 7, round 4)",
        env=dict(
            PP_rew_max=8.0,               # the r4 pace lever (3.5 saturates)
            rew_collision=-70.0,
            abs_inv_CA_min_rew=1.0 / 6.0,
            curriculum_scale=4.0,
            obstacle_radius_max=160.0,
            stage_mix_prob=0.25,
        ),
        ppo=dict(
            hidden_sizes=(128, 128),      # r3 capacity finding
            n_steps=128,
            num_minibatches=64,
            shuffle="timeperm",
        ),
        train=dict(total_timesteps=150_000_000, num_envs=1024),
    ),
    # Hunt-8 pace fine-tune: 8 seeds x 30M from a trained winner
    # (--init-params required) lifted every candidate to true stage_1
    # 1000/1000 and produced the shipped flagship agent_s8004 (0.8822 true
    # mean, gen-2 of the s250 -> s6006 -> s8004 chain).
    "flagship-finetune": dict(
        doc="pace fine-tune recipe (hunt 8, round 4); needs --init-params",
        env=dict(
            PP_rew_max=8.0,
            rew_collision=-70.0,
            abs_inv_CA_min_rew=1.0 / 6.0,
            curriculum_scale=0.05,
            obstacle_radius_max=160.0,
            stage_mix_prob=0.3,
            stage_mix_weights=(3.0, 1.0, 1.0, 1.0, 1.0),
            adaptive_rehearsal=True,
            rehearsal_adapt=False,
        ),
        ppo=dict(
            hidden_sizes=(128, 128),
            n_steps=128,
            num_minibatches=64,
            shuffle="timeperm",
        ),
        train=dict(total_timesteps=30_000_000, num_envs=1024),
    ),
}


def apply_preset(
    name: str,
    env_cfg: EnvConfig,
    ppo_cfg: PPOConfig,
    train_cfg: TrainConfig,
    provided: set = frozenset(),
) -> Tuple[EnvConfig, PPOConfig, TrainConfig]:
    """Overlay preset `name` on the three configs.

    `provided` holds the keys the user set explicitly on the CLI, namespaced
    like the train-CLI argparse attributes ('env_PP_rew_max',
    'ppo_hidden_sizes', 'total_timesteps'); those keep their user value —
    preset fills everything else it defines.
    """
    preset = PRESETS[name]
    for section, cfg_name, cfg in (
        ("env", "env_", env_cfg), ("ppo", "ppo_", ppo_cfg),
        ("train", "", train_cfg),
    ):
        kw = {
            k: v for k, v in preset.get(section, {}).items()
            if f"{cfg_name}{k}" not in provided
        }
        if section == "env":
            env_cfg = cfg.replace(**kw)
        elif section == "ppo":
            ppo_cfg = cfg.replace(**kw)
        else:
            train_cfg = cfg.replace(**kw)
    return env_cfg, ppo_cfg, train_cfg
