"""Environment pytrees (fixed shapes; vmap adds the env batch dimension)."""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax.numpy as jnp

from drone2d_tpu.ops.path import PathData
from drone2d_tpu.ops.physics import BodyState


class ObstacleSet(NamedTuple):
    """Padded obstacle field.

    The reference's live path builds only `Circle`s; `Square`/`Rectangle`
    (obstacles.py:20-45) are ported for component parity as ROUNDED
    axis-aligned boxes: `half_wh` half-extents plus radius `r`.  half_wh is
    None by default — the circles-only fast path, bit-identical to round 1.
    A Square(size) is half_wh=(size/2, size/2), r=0; a Rectangle(w, h) is
    half_wh=(w/2, h/2), r=0.
    """

    xy: jnp.ndarray    # (MAX_OBS, 2) centers; padding pushed far away
    r: jnp.ndarray     # (MAX_OBS,) radii
    mask: jnp.ndarray  # (MAX_OBS,) bool, True = live obstacle
    half_wh: Optional[jnp.ndarray] = None  # (MAX_OBS, 2) box half-extents


class EnvState(NamedTuple):
    """Full per-env episode state.

    The reference rebuilds the whole pymunk world each reset
    (drone_2d_env.py:908-912 reset -> __init__); here the world IS this
    pytree, and reset is a pure function producing a fresh one.
    """

    path: PathData
    obstacles: ObstacleSet
    body: BodyState
    target: jnp.ndarray        # (2,) last waypoint (drone_2d_env.py:316-317)
    t: jnp.ndarray             # () int32 current_time_step
    path_error: jnp.ndarray    # () running sum of dist-from-path (for APE)
    total_reward: jnp.ndarray  # () episode return
    la_locked: jnp.ndarray     # () bool LA_in_last_wp (drone_2d_env.py:112,739-744)
    left_force: jnp.ndarray    # () last applied rotor forces (render parity,
    right_force: jnp.ndarray   # drone_2d_env.py:140-141)
    # Which episode family this episode was drawn from (REHEARSAL_FAMILIES:
    # 0 = scheduled curriculum / test scenario, 1-5 = rehearsed stage_k,
    # 6 = corridor rehearsal, 7 = crossing-wall rehearsal).  Drives the
    # on-device per-family success accounting behind adaptive (PLR-lite)
    # rehearsal reweighting; costs one scalar per env otherwise.
    family: jnp.ndarray        # () int32


class EpisodeStatic(NamedTuple):
    """The leaves of EnvState that are constant within an episode.

    `Drone2DEnv.step` never writes these (env.py step only replaces body/t/
    path_error/total_reward/la_locked/forces); they change ONLY when an
    auto-reset swaps in a template episode.  The split-carry hot loop
    (`step_autoreset_split`) exploits that: instead of re-selecting the
    ~6 KB/env of path tables + obstacles through `where(done, ...)` every
    scanned step (measured 9.1 ns of the 60 ns step, docs/RESULTS.md
    roofline), it carries one `fresh` bit per env and blends
    `where(fresh, template, initial)` at read time from two loop-invariant
    operands.  Values are identical by induction, so the split loop is
    bit-exact vs `step_autoreset_template` (locked by tests/test_env.py).
    """

    path: PathData
    obstacles: ObstacleSet
    target: jnp.ndarray        # (2,)
    family: jnp.ndarray        # () int32


class EpisodeDyn(NamedTuple):
    """The leaves of EnvState that `step` actually mutates (~15 scalars)."""

    body: BodyState
    t: jnp.ndarray
    path_error: jnp.ndarray
    total_reward: jnp.ndarray
    la_locked: jnp.ndarray
    left_force: jnp.ndarray
    right_force: jnp.ndarray


def split_state(state: EnvState) -> "tuple[EpisodeStatic, EpisodeDyn]":
    """EnvState -> (per-episode constants, mutated-by-step leaves)."""
    return (
        EpisodeStatic(state.path, state.obstacles, state.target, state.family),
        EpisodeDyn(
            state.body, state.t, state.path_error, state.total_reward,
            state.la_locked, state.left_force, state.right_force,
        ),
    )


def merge_state(static: EpisodeStatic, dyn: EpisodeDyn) -> EnvState:
    """Inverse of split_state."""
    return EnvState(
        path=static.path,
        obstacles=static.obstacles,
        body=dyn.body,
        target=static.target,
        t=dyn.t,
        path_error=dyn.path_error,
        total_reward=dyn.total_reward,
        la_locked=dyn.la_locked,
        left_force=dyn.left_force,
        right_force=dyn.right_force,
        family=static.family,
    )


def finalize_split(init_static, tmpl_static, fresh, dyn) -> EnvState:
    """Materialize the full EnvState at the END of a split-carry chunk.

    The split-carry loop (`Drone2DEnv.step_autoreset_split`) never writes
    the per-episode constants; the true statics at time t are the blend
    `where(fresh_t, template, initial)`.  Any caller that stops the loop and
    wants a real `EnvState` back — to start the next chunk against a NEW
    template, checkpoint, or inspect — MUST apply this blend once; carrying
    `init_static` forward unblended would silently resurrect pre-reset
    episode geometry for every env that auto-reset during the chunk.  This
    helper is that contract in one place (batched: all arguments may carry
    a leading env dim, `fresh` broadcasting against each static leaf).
    """
    import jax

    fresh = jnp.asarray(fresh)

    def blend(a, b):
        f = fresh.reshape(fresh.shape + (1,) * (jnp.ndim(a) - fresh.ndim))
        return jnp.where(f, b, a)

    static = jax.tree.map(blend, init_static, tmpl_static)
    return merge_state(static, dyn)


# family-axis layout for rehearsal accounting (EnvState.family values)
N_FAMILIES = 8
FAMILY_NAMES = (
    "schedule", "stage_1", "stage_2", "stage_3", "stage_4", "stage_5",
    "corridor", "cross",
)


class StepOutput(NamedTuple):
    state: EnvState
    obs: jnp.ndarray           # (27,)
    reward: jnp.ndarray        # ()
    done: jnp.ndarray          # () bool
    info: Dict[str, jnp.ndarray]


# Names (and semantics) of the info-dict metric bus, mirroring
# drone_2d_env.py:114-137, 575-613.
INFO_FIELDS = (
    "reward",
    "collision_avoidance_reward",
    "path_adherence",
    "path_progression",
    "collision_reward",
    "reach_end_reward",
    "agressive_alpha_reward",
    "dist_closest_obs",
    "env_steps",
    "APE",
    "n_collisions",
    "n_successful_runs",
    "n_failed_runs",
    "total_reward",
)
