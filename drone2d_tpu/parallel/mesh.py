"""Scale-out: env-batch data parallelism over a JAX device mesh.

The reference's only parallelism is a process farm of envs on one CPU
(`main.py:183-190`, SubprocVecEnv over cpu_count-2 workers) feeding a single
learner.  The TPU-native equivalent (SURVEY.md §2.3/§5.8): shard the env
batch over every chip with `shard_map` on a 1-D `Mesh(("data",))`, run the
FULL PPO update (rollout + GAE + minibatch SGD) per shard, and all-reduce
gradients and episode stats with `pmean`/`psum` over ICI.  Parameters and
optimizer state are replicated; env state, obs, and rollout tensors are
sharded on their env dimension.  Multi-host: the same mesh spans hosts —
the collectives ride ICI within a slice and DCN across slices; nothing
else changes.

Model sharding (tp/pp) is deliberately absent FOR THIS WORKLOAD: the policy
is a 27->64->64->2 MLP — thousands of times smaller than one MXU tile — so
any model partitioning would be pure overhead.  The correct TPU
decomposition is pure DP over envs, which is also the scale axis the
reference's design implies (SURVEY.md §2.3, §5.7).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from drone2d_tpu.learn.ppo import PPOLearner, TrainState

AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    """1-D data mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    return jax.make_mesh((len(devices),), (AXIS,), devices=list(devices))


def _state_spec(state_shape) -> TrainState:
    """PartitionSpecs for a TrainState: params/opt/rng replicated, env-batch
    leaves sharded on their leading (env) dim."""
    rep, shard0 = P(), P(AXIS)
    return TrainState(
        params=jax.tree.map(lambda _: rep, state_shape.params),
        opt_state=jax.tree.map(lambda _: rep, state_shape.opt_state),
        env_state=jax.tree.map(lambda _: shard0, state_shape.env_state),
        obs=shard0,
        rng=rep,
        global_step=rep,
        episodes_total=rep,
        # PLR-lite state: probs are controller-set (identical everywhere);
        # family counts are psum-reduced inside update, so replicated too
        rehearsal_probs=rep,
        family_counts=rep,
        family_wins=rep,
    )


def _local_learner(learner: PPOLearner, n_dev: int) -> PPOLearner:
    if learner.num_envs % n_dev:
        raise ValueError(f"num_envs={learner.num_envs} % {n_dev} devices != 0")
    return PPOLearner(
        learner.env.cfg,
        learner.cfg,
        learner.num_envs // n_dev,
        step_increment=learner.num_envs,
    )


def shard_init(mesh: Mesh, learner: PPOLearner, key: jax.Array) -> TrainState:
    """Initialize a TrainState laid out for `shard_update` on `mesh`.

    learner.num_envs is the GLOBAL env count.  Params are initialized
    identically on every shard (replicated); each shard resets its own env
    slice from a per-shard fold of the env key.
    """
    n_dev = mesh.devices.size
    local = _local_learner(learner, n_dev)

    def init_shard(key):
        idx = jax.lax.axis_index(AXIS)
        state = local.init(jax.random.fold_in(key, 0))  # same params everywhere
        env_state, obs = local.env.reset_batch(
            jax.random.fold_in(key, 1 + idx), local.num_envs, 0,
            state.rehearsal_probs if local.env.cfg.adaptive_rehearsal else None,
        )
        return state._replace(env_state=env_state, obs=obs)

    # same pytree structure as local.init (axis_index-free, eval_shape-safe)
    spec = _state_spec(jax.eval_shape(local.init, key))
    f = shard_map(
        init_shard, mesh=mesh, in_specs=(P(),), out_specs=spec, check_vma=False
    )
    return jax.jit(f)(key)


def shard_update(mesh: Mesh, learner: PPOLearner):
    """Build the jitted sharded PPO update: TrainState -> (TrainState, metrics).

    Each shard rolls out its local env slice; advantage-normalization
    statistics, gradients, losses, and episode stats are reduced across the
    mesh per minibatch (pmean/psum inside `PPOLearner.update`/`loss_fn`), so
    the math IS large-batch single-device PPO whose k-th minibatch is the
    union of the shards' k-th local minibatches.  Both directions are
    executed tests, not prose: a 1-device mesh is bit-identical to
    `PPOLearner.update`, and an 8-shard run matches a single-device
    union-batch reference to fp-reassociation tolerance after two updates
    (tests/test_parallel.py::test_one_device_mesh_bitwise_matches_plain,
    ::test_eight_shard_matches_single_device_reference).
    """
    n_dev = mesh.devices.size
    local = _local_learner(learner, n_dev)

    # A 1-device mesh needs no collectives: pmean/psum over a size-1 axis is
    # semantically the identity, but the extra HLO nodes perturb XLA:CPU's
    # fusion choices by ~1 ulp in the optimizer tail.  Skipping them makes
    # the 1-device mesh BIT-IDENTICAL to the plain update (locked by
    # tests/test_parallel.py); the real collective path is exercised and
    # checked at 8 shards by the union-batch reference test.
    axis = AXIS if n_dev > 1 else None

    def upd(state: TrainState):
        idx = jax.lax.axis_index(AXIS)
        # decorrelate per-shard sampling; keep the replicated parent intact
        new_state, metrics = local.update(
            state._replace(rng=jax.random.fold_in(state.rng, idx)),
            axis_name=axis,
        )
        # advance the REPLICATED parent rng deterministically on all shards
        next_rng = jax.random.split(state.rng, 1)[0]
        return new_state._replace(rng=next_rng), metrics

    state_shape = jax.eval_shape(local.init, jax.random.PRNGKey(0))
    st_spec = _state_spec(state_shape)
    metrics_shape = jax.eval_shape(lambda s: local.update(s)[1], state_shape)
    metrics_spec = jax.tree.map(lambda _: P(), metrics_shape)

    f = shard_map(
        upd,
        mesh=mesh,
        in_specs=(st_spec,),
        out_specs=(st_spec, metrics_spec),
        check_vma=False,
    )
    return jax.jit(f)
