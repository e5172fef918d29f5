"""Vmapped zoo training: a whole population of seeds as ONE device program.

The reference's methodology is "train ~20 runs, hand-pick the best"
(ppo_agents/ holds ~80 checkpoints across runs; the best three are enshrined
in best_models_config_and_res/).  Its cost model is a process farm per run.
Here the entire PPO update is pure over `TrainState`, so a population is
just `jax.vmap(learner.update)` over a stacked state: S seeds roll out,
compute GAE, and take their 640 SGD steps in lockstep in one XLA program.

Measured (one v5e chip, quality recipe 1024 envs x 128 steps x 640 SGD;
docs/RESULTS.md "Zoo training"): under the default exact shuffle the
batched minibatch gather scales with S and caps the win at ~9% over
sequential runs, but with `PPOConfig.shuffle='timeperm'` (gather-free) a
population of 8 trains at 4.26M total env-steps/s — 2.9x the sequential
rate, with the rollout phase running at the env hot-loop's own speed.
On a multi-chip mesh the population axis shards with zero collectives
(`shard_population`), multiplying that rate by device count.

Seed-selection campaigns pair this with `scripts/select_agents.py`
(batched multi-agent eval) for an end-to-end hunt that never leaves the
device except to snapshot params.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from drone2d_tpu.config import EnvConfig, PPOConfig
from drone2d_tpu.learn.ppo import PPOLearner, TrainState
from drone2d_tpu.models.policy import params_to_flat_dict


class ZooTrainer:
    """Binds (EnvConfig, PPOConfig, num_envs) into vmapped population fns.

    `init(seeds)` -> stacked TrainState (leading axis = agent);
    `update(state)` -> (state', metrics) with every metric shaped (S,).
    """

    def __init__(self, env_cfg: EnvConfig, ppo_cfg: PPOConfig, num_envs: int):
        self.learner = PPOLearner(env_cfg, ppo_cfg, num_envs)
        self._init = jax.jit(jax.vmap(self.learner.init))
        self._update = jax.jit(jax.vmap(self.learner.update))

    @property
    def steps_per_update(self) -> int:
        return self.learner.cfg.n_steps * self.learner.num_envs

    def init(self, seeds: Sequence[int]) -> TrainState:
        keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
        return self._init(keys)

    def update(self, state: TrainState):
        return self._update(state)


def shard_population(state: TrainState, mesh) -> TrainState:
    """Lay the stacked population out over a device mesh: every leaf's
    leading (agent) axis is sharded across the mesh's first axis.

    Population training is embarrassingly parallel — each seed's update
    touches only its own slice — so `jit(vmap(update))` on a state laid out
    this way partitions with ZERO collectives: GSPMD propagates the input
    sharding through the whole program and each device trains S/D seeds.
    This is the multi-chip hunt: a pod trains the reference's entire
    ~20-run selection campaign in one program with no inter-chip traffic.

        mesh = make_mesh()                       # e.g. 8 chips
        state = shard_population(trainer.init(range(32)), mesh)
        state, metrics = trainer.update(state)   # 4 seeds per chip

    Requires len(seeds) % mesh.devices.size == 0.
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    axis = mesh.axis_names[0]
    S = jax.tree.leaves(state)[0].shape[0]
    if S % mesh.devices.size:
        raise ValueError(
            f"population size {S} not divisible by {mesh.devices.size} devices"
        )
    # GSPMD auto propagation needs Auto-typed axes; jax.make_mesh (as used by
    # parallel.make_mesh) yields Explicit axes on current JAX, under which
    # eager/jit ops on the sharded state demand mesh-context plumbing.
    # Rebuild the same device set as a classic Auto mesh.
    auto_mesh = Mesh(np.asarray(mesh.devices).reshape(-1), (axis,))
    return jax.device_put(state, NamedSharding(auto_mesh, PartitionSpec(axis)))


def save_zoo(
    state: TrainState,
    seeds: Sequence[int],
    out_root: str,
    step: Optional[int] = None,
) -> List[str]:
    """Write each population member's params as seed_<s>/new_agent.npz
    (final) or seed_<s>/ckpt_<step>.npz (mid-run snapshot) — the layout
    scripts/select_agents.py consumes."""
    params = jax.device_get(state.params)
    paths = []
    for i, s in enumerate(seeds):
        p_i = jax.tree.map(lambda x: x[i], params)
        flat = {k: np.asarray(v) for k, v in params_to_flat_dict(p_i).items()}
        d = os.path.join(out_root, f"seed_{s}")
        os.makedirs(d, exist_ok=True)
        name = "new_agent.npz" if step is None else f"ckpt_{step}.npz"
        path = os.path.join(d, name)
        np.savez(path, **flat)
        paths.append(path)
    return paths


def train_zoo(
    env_cfg: EnvConfig,
    ppo_cfg: PPOConfig,
    num_envs: int,
    seeds: Sequence[int],
    total_timesteps: int,
    out_root: str,
    *,
    snapshots: int = 3,
    snapshot_steps: Optional[Sequence[int]] = None,
    log_every: int = 20,
    init_params: Optional[str] = None,
) -> TrainState:
    """Train the whole seed population to total_timesteps each, snapshotting
    intermediate per-seed .npz checkpoints along the way: `snapshots` evenly
    spaced ones, or — when `snapshot_steps` is given — at the first update
    whose cumulative env-step count reaches each requested step (the
    sample-efficiency-frontier use: e.g. the reference's 9M budget plus
    doublings; rl_config.py:6).

    Metrics print as population summaries (mean/max success rate); per-seed
    curves are what select_agents.py is for.
    """
    import time

    trainer = ZooTrainer(env_cfg, ppo_cfg, num_envs)
    if env_cfg.adaptive_rehearsal and float(
        np.sum(np.asarray(trainer.learner.initial_rehearsal_probs()))
    ) <= 0.0:
        raise ValueError(
            "adaptive_rehearsal=True with a zero rehearsal budget is a "
            "silent no-op: set stage_mix_prob (and/or corridor_mix_prob, "
            "cross_mix_prob) > 0 to define the budget the controller "
            "redistributes"
        )
    state = trainer.init(seeds)
    if init_params:
        # population fine-tune: every member warm-starts from the same saved
        # agent (policy only — optimizer state, env batches, and rng streams
        # stay per-seed, so members diverge through data order and sampling)
        from drone2d_tpu.eval.run import load_params

        loaded = load_params(init_params)
        got = jax.tree.map(lambda x: jnp.shape(x), loaded)
        want = jax.tree.map(lambda x: jnp.shape(x)[1:], state.params)
        if jax.tree.leaves(got) != jax.tree.leaves(want):
            raise ValueError(
                f"init_params {init_params} has shapes {got}, but the "
                f"population expects {want} (check hidden_sizes)"
            )
        S = len(seeds)
        state = state._replace(params=jax.tree.map(
            lambda x: jnp.broadcast_to(jnp.asarray(x), (S,) + jnp.shape(x)),
            loaded,
        ))
        print(f"warm-started {S} members from {init_params}")
    spu = trainer.steps_per_update
    n_updates = max((total_timesteps + spu - 1) // spu, 1)
    if snapshot_steps is not None:
        # a requested step at/after the end still writes its ckpt_<step>.npz
        # at the final update (new_agent.npz has no step label for
        # select_agents to campaign over)
        snap_at = {
            min(max(-(-int(s) // spu), 1), n_updates)
            for s in snapshot_steps
        }
    else:
        # clamp into [1, n_updates-1]: update 0 never fires (u starts at 1)
        # and n_updates would duplicate the final save; short runs get fewer
        # (distinct) snapshots than asked rather than silent dupes
        snap_at = {
            min(max(round(n_updates * (i + 1) / (snapshots + 1)), 1), n_updates - 1)
            for i in range(snapshots)
        } if n_updates > 1 else set()

    # controller ticks only when the PLR controller is enabled; with
    # rehearsal_adapt=False the probs stay fixed at their (possibly
    # stage_mix_weights-weighted) initialization
    adaptive = env_cfg.adaptive_rehearsal and env_cfg.rehearsal_adapt
    plr_last = (
        np.asarray(jax.device_get(state.family_counts)),
        np.asarray(jax.device_get(state.family_wins)),
    )
    t0 = time.perf_counter()
    for u in range(1, n_updates + 1):
        state, metrics = trainer.update(state)
        if adaptive and u % log_every == 0:
            # PLR-lite tick, vectorized over the population: each member
            # reweights its own rehearsal families by its own measured
            # failure rates (learn/plr.py broadcasts over leading axes)
            from drone2d_tpu.learn.plr import reweight_rehearsal

            counts = np.asarray(jax.device_get(state.family_counts))
            wins = np.asarray(jax.device_get(state.family_wins))
            probs = np.asarray(jax.device_get(state.rehearsal_probs))
            new_probs = reweight_rehearsal(
                probs, counts - plr_last[0], wins - plr_last[1]
            )
            plr_last = (counts, wins)
            state = state._replace(
                rehearsal_probs=jax.device_put(
                    jnp.asarray(new_probs), state.rehearsal_probs.sharding
                )
            )
        if u == 1:
            # device_get, not block_until_ready: the latter has been observed
            # returning before the dispatch queue drains on the remote axon
            # backend, which would fold compile time into the printed rate
            np.asarray(jax.device_get(metrics["loss"]))
            t0 = time.perf_counter()  # exclude compile from the rate
        if u % log_every == 0 or u == n_updates:
            sr = np.asarray(jax.device_get(metrics["episodes/success_rate"]))
            loss = np.asarray(jax.device_get(metrics["loss"]))
            rate = spu * len(seeds) * max(u - 1, 1) / max(
                time.perf_counter() - t0, 1e-9
            )
            print(
                f"update {u}/{n_updates}  step {u * spu:>9d}/seed  "
                f"loss {loss.mean():8.3f}  sr mean {sr.mean():.2f} "
                f"max {sr.max():.2f}  {rate:,.0f} steps/s ({len(seeds)} seeds)"
            )
        if u in snap_at:
            save_zoo(state, seeds, out_root, step=u * spu)
    save_zoo(state, seeds, out_root, step=None)
    return state
