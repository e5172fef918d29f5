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
