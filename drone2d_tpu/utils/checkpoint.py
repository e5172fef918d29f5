"""Checkpoint / resume via orbax.

The reference checkpoints through SB3's CheckpointCallback every
100000//num_cpu learner steps to `logs/rl_model_<steps>_steps.zip`
(`main.py:161-166,193-198`), and — oddly — the curriculum stage is recovered
by globbing those filenames (`drone_2d_env.py:79-86`).  Here the checkpoint
is one pytree (params, opt_state, rng, global_step) and the curriculum clock
IS `global_step` (scenarios.stage_from_step), so resume is exact and
race-free (SURVEY.md §5.2-5.4).

Env state is deliberately NOT checkpointed: episodes are cheap to restart
(the reference likewise rebuilds every env world on (re)start), and the
saved rng makes the restart deterministic.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from drone2d_tpu.learn.ppo import PPOLearner, TrainState


def _manager(directory: str, keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
    )


def save_checkpoint(
    directory: str, state: TrainState, *, keep: int = 5, wait: bool = False
) -> int:
    """Persist the learner state at its current global_step.  Returns the step."""
    step = int(np.asarray(jax.device_get(state.global_step)))
    payload = dict(
        params=jax.device_get(state.params),
        opt_state=jax.device_get(state.opt_state),
        rng=jax.device_get(jax.random.key_data(state.rng))
        if jax.dtypes.issubdtype(state.rng.dtype, jax.dtypes.prng_key)
        else jax.device_get(state.rng),
        global_step=step,
        episodes_total=int(np.asarray(jax.device_get(state.episodes_total))),
        rehearsal_probs=np.asarray(jax.device_get(state.rehearsal_probs)),
        family_counts=np.asarray(jax.device_get(state.family_counts)),
        family_wins=np.asarray(jax.device_get(state.family_wins)),
    )
    mgr = _manager(directory, keep)
    mgr.save(step, args=ocp.args.StandardSave(payload))
    if wait:
        mgr.wait_until_finished()
    mgr.close()
    return step


def restore_checkpoint(
    directory: str,
    learner: PPOLearner,
    key: jax.Array,
    *,
    step: Optional[int] = None,
) -> Tuple[TrainState, int]:
    """Rebuild a runnable TrainState from the latest (or given) checkpoint.

    Envs are freshly reset at the restored global_step, so the curriculum
    stage picks up exactly where training left off.
    """
    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {directory!r}")
    template = jax.eval_shape(learner.init, key)
    restore_tpl = dict(
        params=template.params,
        opt_state=template.opt_state,
        rng=jax.ShapeDtypeStruct((2,), np.uint32),
        global_step=0,
        episodes_total=0,
        rehearsal_probs=np.zeros(7, np.float32),
        family_counts=np.zeros(8, np.float32),
        family_wins=np.zeros(8, np.float32),
    )
    # checkpoints written before newer TrainState fields existed
    # (episodes_total in r1, the PLR fields in r3) lack those keys and orbax
    # rejects a template with extra keys.  Build the template from the
    # checkpoint's OWN key set (the .get() fallbacks below default the
    # missing fields) instead of retrying on error — a real failure like a
    # params shape mismatch then surfaces undisturbed.
    try:
        # a reopened manager needs the handler to expose item metadata
        meta_mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            item_handlers=ocp.StandardCheckpointHandler(),
        )
        stored_keys = set(meta_mgr.item_metadata(step).keys())
        meta_mgr.close()
    except Exception:
        stored_keys = None  # metadata unavailable: try the full template
    tpl = {
        k: v for k, v in restore_tpl.items()
        if stored_keys is None or k in stored_keys
    }
    payload = mgr.restore(step, args=ocp.args.StandardRestore(tpl))
    mgr.close()
    rng = jax.random.wrap_key_data(np.asarray(payload["rng"], np.uint32))
    probs = jax.numpy.asarray(
        payload.get("rehearsal_probs", learner.initial_rehearsal_probs()),
        jax.numpy.float32,
    )
    env_state, obs = learner.env.reset_batch(
        jax.random.fold_in(rng, 17), learner.num_envs, payload["global_step"],
        probs if learner.env.cfg.adaptive_rehearsal else None,
    )
    state = TrainState(
        params=jax.tree.map(jax.numpy.asarray, payload["params"]),
        opt_state=jax.tree.map(jax.numpy.asarray, payload["opt_state"]),
        env_state=env_state,
        obs=obs,
        rng=rng,
        global_step=jax.numpy.float32(payload["global_step"]),
        episodes_total=jax.numpy.float32(payload.get("episodes_total", 0)),
        rehearsal_probs=probs,
        family_counts=jax.numpy.asarray(
            payload.get("family_counts", np.zeros(8)), jax.numpy.float32),
        family_wins=jax.numpy.asarray(
            payload.get("family_wins", np.zeros(8)), jax.numpy.float32),
    )
    return state, int(payload["global_step"])
