"""On-device clipped PPO — the SB3 `PPO("MlpPolicy")` equivalent.

The reference's whole L5 is external (`main.py:200,208`: SB3 PPO with
ent_coef=0.01, everything else default).  This module re-implements that
algorithm TPU-first:

* rollouts are a `lax.scan` over time of the vmapped auto-resetting env
  step (`Drone2DEnv.step_batch`) with the policy sampled in-graph — the
  SubprocVecEnv process farm (`main.py:183-190`) becomes thousands of
  on-chip envs in lockstep;
* GAE + n_epochs x minibatch clipped-surrogate updates run in the same
  jit program, so one `update()` call = one XLA executable: no host
  round-trips inside the hot loop;
* episode metrics (the `tensorboardlogger.py:49-110` channels) are
  aggregated on-device inside the rollout scan and fetched once per update.

SB3 defaults mirrored: lr 3e-4, Adam eps 1e-5, gamma .99, lambda .95,
clip .2, vf_coef .5, ent_coef .01 (rl_config.py:7), max_grad_norm .5,
advantage normalization per minibatch, unclipped value loss
(clip_range_vf=None), 10 epochs.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from drone2d_tpu.config import EnvConfig, PPOConfig
from drone2d_tpu.env.env import ACT_DIM, OBS_DIM, Drone2DEnv
from drone2d_tpu.env.types import N_FAMILIES, EnvState
from drone2d_tpu.learn.gae import compute_gae
from drone2d_tpu.models.policy import (
    ActorCriticParams,
    action_log_prob_entropy,
    init_actor_critic,
    policy_value,
    sample_action,
)

# Final-step info components averaged over finished episodes, mirroring the
# reference's TB channels episodes/avg_* (tensorboardlogger.py:101-108).
# (The reference's `=` instead of `+=` on the last two — tensorboardlogger.py:88-89
# — is a bug we do not replicate: all components are summed then averaged.)
_COMPONENT_KEYS = (
    "reward",
    "collision_reward",
    "collision_avoidance_reward",
    "path_adherence",
    "path_progression",
    "reach_end_reward",
    "agressive_alpha_reward",
)


class EpisodeStats(NamedTuple):
    """On-device accumulator of per-episode metrics over one rollout."""

    n_episodes: jnp.ndarray          # () f32 — finished episodes
    sum_length: jnp.ndarray          # () f32 — sum of final env_steps
    sum_total_reward: jnp.ndarray    # () f32 — sum of episode returns
    sum_ape: jnp.ndarray             # () f32 — sum of episode APEs
    n_success: jnp.ndarray           # () f32
    n_fail: jnp.ndarray              # () f32
    n_collision: jnp.ndarray         # () f32
    sum_components: jnp.ndarray      # (7,) f32 — final-step reward components
    # per-rehearsal-family episode/success counts (env.types.FAMILY_NAMES
    # axis); all-zero unless EnvConfig.adaptive_rehearsal is on
    family_counts: jnp.ndarray       # (8,) f32
    family_wins: jnp.ndarray         # (8,) f32

    @staticmethod
    def zeros() -> "EpisodeStats":
        z = jnp.float32(0.0)
        zf = jnp.zeros((N_FAMILIES,), jnp.float32)
        return EpisodeStats(z, z, z, z, z, z, z, jnp.zeros((7,), jnp.float32), zf, zf)

    def summary(self) -> Dict[str, jnp.ndarray]:
        n = jnp.maximum(self.n_episodes, 1.0)
        out = {
            "episodes": self.n_episodes,
            "avg_length": self.sum_length / n,
            "avg_total_reward": self.sum_total_reward / n,
            "avg_APE": self.sum_ape / n,
            "success_rate": self.n_success / n,
            "failure_rate": self.n_fail / n,
            "collision_rate": self.n_collision / n,
        }
        for i, k in enumerate(_COMPONENT_KEYS):
            out[f"avg_{k}"] = self.sum_components[i] / n
        return out


class TrainState(NamedTuple):
    params: ActorCriticParams
    opt_state: optax.OptState
    env_state: EnvState            # batched (leading dim = local num_envs)
    obs: jnp.ndarray               # (N, 27)
    rng: jax.Array
    # Env-step counter as float32: incremented ONCE per rollout by
    # n_steps*num_envs (a multiple of 2^k for the usual pow-2 batch shapes),
    # so additions stay exact far past the int32 wrap at 2.1B — exact to
    # ~1e12 steps for pow-2 increments, and in any case accurate to well
    # under the num_envs granularity the curriculum clock can resolve.
    # (int64 would need jax_enable_x64, which would poison every dtype.)
    global_step: jnp.ndarray       # () float32 env-step counter
    # Cumulative finished-episode count, accumulated ON DEVICE so the train
    # loop never has to device_get per update (a host sync per update would
    # serialize dispatch; metrics are fetched only on logging updates).
    # Reduced across shards under shard_map, carried through checkpoints.
    episodes_total: jnp.ndarray    # () float32 cumulative episodes
    # Adaptive (PLR-lite) rehearsal state.  rehearsal_probs (7,) is the
    # per-episode probability of each rehearsal family (stage_1..stage_5,
    # corridor, cross) threaded into env.reset as DATA when
    # EnvConfig.adaptive_rehearsal is on — a controller (learn/plr.py) can
    # rewrite it between updates with zero recompiles.  family_counts/wins
    # (8,) accumulate finished episodes / successes per family on device
    # (axis: env.types.FAMILY_NAMES).  All three are inert (zeros / static
    # config values) when adaptive_rehearsal is off.
    rehearsal_probs: jnp.ndarray   # (7,) f32
    family_counts: jnp.ndarray     # (8,) f32 cumulative
    family_wins: jnp.ndarray       # (8,) f32 cumulative


class RolloutBatch(NamedTuple):
    obs: jnp.ndarray        # (T, N, 27)
    actions: jnp.ndarray    # (T, N, 2)
    log_probs: jnp.ndarray  # (T, N)
    values: jnp.ndarray     # (T, N)
    rewards: jnp.ndarray    # (T, N)
    dones: jnp.ndarray      # (T, N)


class PPOLearner:
    """Binds (EnvConfig, PPOConfig, num_envs) into pure jit-ready functions.

    `update(state)` is the one-call training step: rollout n_steps, GAE,
    epochs x minibatches, returns (new_state, metrics).  Shard it over a
    mesh with `drone2d_tpu.parallel.shard_update`.
    """

    def __init__(
        self,
        env_cfg: EnvConfig,
        ppo_cfg: PPOConfig,
        num_envs: int,
        *,
        step_increment: int | None = None,
    ):
        self.env = Drone2DEnv(env_cfg)
        self.cfg = ppo_cfg
        self.num_envs = num_envs
        # global_step advance per env step; under shard_map the local learner
        # steps num_envs/n_dev envs but the GLOBAL batch advances by the full
        # env count, which drives the curriculum clock (scenarios.stage_from_step)
        self.step_increment = num_envs if step_increment is None else step_increment
        batch_size = ppo_cfg.n_steps * num_envs
        if batch_size % ppo_cfg.num_minibatches:
            raise ValueError(
                f"n_steps*num_envs={batch_size} not divisible by "
                f"num_minibatches={ppo_cfg.num_minibatches}"
            )
        self.minibatch_size = batch_size // ppo_cfg.num_minibatches
        if ppo_cfg.shuffle not in ("exact", "affine", "timeperm"):
            raise ValueError(
                "shuffle must be 'exact', 'affine' or 'timeperm', "
                f"got {ppo_cfg.shuffle!r}"
            )
        if ppo_cfg.shuffle == "affine" and batch_size & (batch_size - 1):
            raise ValueError(
                "shuffle='affine' needs a power-of-two batch (odd multiplier "
                f"bijection); n_steps*num_envs={batch_size}"
            )
        if ppo_cfg.shuffle == "timeperm" and ppo_cfg.n_steps % ppo_cfg.num_minibatches:
            raise ValueError(
                "shuffle='timeperm' slices minibatches as whole timesteps: "
                f"n_steps={ppo_cfg.n_steps} must be divisible by "
                f"num_minibatches={ppo_cfg.num_minibatches}"
            )
        self.tx = optax.chain(
            optax.clip_by_global_norm(ppo_cfg.max_grad_norm),
            optax.adam(ppo_cfg.learning_rate, eps=1e-5),
        )

    # -- construction --------------------------------------------------------

    def initial_rehearsal_probs(self) -> jnp.ndarray:
        """Starting family probabilities: the static mix knobs spread over
        their families — stage_mix_prob split across the 5 stages by
        cfg.stage_mix_weights (default uniform, matching the static path's
        uniform stage draw)."""
        e = self.env.cfg
        w = [float(x) for x in e.stage_mix_weights]
        if len(w) != 5 or min(w) < 0.0 or sum(w) <= 0.0:
            raise ValueError(
                f"stage_mix_weights must be 5 nonnegative weights with a "
                f"positive sum, got {e.stage_mix_weights}"
            )
        stage_probs = [e.stage_mix_prob * x / sum(w) for x in w]
        if any(abs(x - w[0]) > 1e-9 for x in w) and not e.adaptive_rehearsal:
            raise ValueError(
                "non-uniform stage_mix_weights only take effect through the "
                "adaptive reset path (probabilities as data); set "
                "adaptive_rehearsal=True (with rehearsal_adapt=False for a "
                "fixed weighted mix)"
            )
        return jnp.asarray(
            stage_probs + [e.corridor_mix_prob, e.cross_mix_prob], jnp.float32
        )

    def init(self, key: jax.Array) -> TrainState:
        k_params, k_env, k_rng = jax.random.split(key, 3)
        params = init_actor_critic(
            k_params, OBS_DIM, ACT_DIM, self.cfg.hidden_sizes
        )
        probs = self.initial_rehearsal_probs()
        env_state, obs = self.env.reset_batch(
            k_env, self.num_envs, 0,
            probs if self.env.cfg.adaptive_rehearsal else None,
        )
        return TrainState(
            params=params,
            opt_state=self.tx.init(params),
            env_state=env_state,
            obs=obs,
            rng=k_rng,
            global_step=jnp.float32(0.0),
            episodes_total=jnp.float32(0.0),
            rehearsal_probs=probs,
            family_counts=jnp.zeros((N_FAMILIES,), jnp.float32),
            family_wins=jnp.zeros((N_FAMILIES,), jnp.float32),
        )

    # -- rollout -------------------------------------------------------------

    def rollout(
        self, state: TrainState
    ) -> Tuple[TrainState, RolloutBatch, jnp.ndarray, EpisodeStats]:
        """Collect n_steps across all envs under the current policy.

        Returns (state', batch, last_values, episode_stats)."""
        cfg = self.cfg

        # fresh reset targets, built ONCE per rollout outside the scan (the
        # in-scan auto-reset only selects them; see step_autoreset_template)
        template_key, rollout_rng = jax.random.split(state.rng)
        adaptive = self.env.cfg.adaptive_rehearsal
        reset_state, reset_obs = self.env.reset_batch(
            template_key, self.num_envs, state.global_step,
            state.rehearsal_probs if adaptive else None,
        )

        def step_fn(carry, _):
            env_state, obs, rng = carry
            rng, k_act = jax.random.split(rng)
            action, log_prob, value = sample_action(state.params, obs, k_act)
            clipped = jnp.clip(action, -1.0, 1.0)  # SB3 clips for the env only
            out = self.env.step_batch_template(
                env_state, clipped, reset_state, reset_obs
            )
            # family read PRE-step: the episode that just finished, not the
            # auto-reset replacement
            stats_delta = (out.info, out.done, env_state.family)
            carry = (out.state, out.obs, rng)
            ys = (obs, action, log_prob, value, out.reward, out.done, stats_delta)
            return carry, ys

        (env_state, obs, rng), ys = jax.lax.scan(
            step_fn,
            (state.env_state, state.obs, rollout_rng),
            None,
            length=cfg.n_steps,
        )
        # one exact add per rollout (see TrainState.global_step)
        global_step = state.global_step + jnp.float32(
            cfg.n_steps * self.step_increment
        )
        obs_t, actions, log_probs, values, rewards, dones, stats_seq = ys

        # fold per-step episode stats (infos stacked over T by the scan)
        infos, done_seq, fam_seq = stats_seq
        d = done_seq.astype(jnp.float32)
        n_done = jnp.sum(d)
        comp = jnp.stack([jnp.sum(infos[k] * d) for k in _COMPONENT_KEYS])
        if adaptive:
            # per-family episode/success accounting (no one-hot
            # materialization: 8 masked reductions over the (T, N) plane)
            win = infos["n_successful_runs"].astype(jnp.float32) * d
            fam_counts = jnp.stack(
                [jnp.sum(jnp.where(fam_seq == f, d, 0.0)) for f in range(N_FAMILIES)]
            )
            fam_wins = jnp.stack(
                [jnp.sum(jnp.where(fam_seq == f, win, 0.0)) for f in range(N_FAMILIES)]
            )
        else:
            fam_counts = jnp.zeros((N_FAMILIES,), jnp.float32)
            fam_wins = jnp.zeros((N_FAMILIES,), jnp.float32)
        stats = EpisodeStats(
            n_episodes=n_done,
            sum_length=jnp.sum(infos["env_steps"] * d),
            sum_total_reward=jnp.sum(infos["total_reward"] * d),
            sum_ape=jnp.sum(infos["APE"] * d),
            n_success=jnp.sum(infos["n_successful_runs"] * d),
            n_fail=jnp.sum(infos["n_failed_runs"] * d),
            n_collision=jnp.sum(infos["n_collisions"] * d),
            sum_components=comp,
            family_counts=fam_counts,
            family_wins=fam_wins,
        )

        _, _, last_values = policy_value(state.params, obs)
        new_state = state._replace(
            env_state=env_state, obs=obs, rng=rng, global_step=global_step
        )
        batch = RolloutBatch(obs_t, actions, log_probs, values, rewards, dones)
        return new_state, batch, last_values, stats

    # -- loss ----------------------------------------------------------------

    def loss_fn(
        self,
        params: ActorCriticParams,
        obs: jnp.ndarray,
        actions: jnp.ndarray,
        old_log_probs: jnp.ndarray,
        advantages: jnp.ndarray,
        returns: jnp.ndarray,
        axis_name: str | None = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        log_prob, entropy, value = action_log_prob_entropy(params, obs, actions)

        # Per-minibatch advantage normalization (SB3 normalize_advantage=True).
        # Under shard_map the minibatch is the UNION of the shards' local
        # minibatches, so the statistics are pmean'd across the mesh (equal
        # local sizes -> pmean of local moments IS the union moment); the
        # sharded update is then numerically the same program as large-batch
        # single-device PPO on the union minibatch (advantages are rollout
        # DATA, so no gradient flows through these stats).  Both branches use
        # the same explicit two-pass formula so the 1-device-mesh path is
        # bit-identical to the unsharded one (tests/test_parallel.py).
        m = jnp.mean(advantages)
        if axis_name is not None:
            m = jax.lax.pmean(m, axis_name)
        var = jnp.mean(jnp.square(advantages - m))
        if axis_name is not None:
            var = jax.lax.pmean(var, axis_name)
        adv = (advantages - m) / (jnp.sqrt(var) + 1e-8)

        ratio = jnp.exp(log_prob - old_log_probs)
        pg1 = adv * ratio
        pg2 = adv * jnp.clip(ratio, 1.0 - cfg.clip_range, 1.0 + cfg.clip_range)
        pg_loss = -jnp.mean(jnp.minimum(pg1, pg2))

        v_loss = jnp.mean((returns - value) ** 2)
        ent = jnp.mean(entropy)
        loss = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * ent

        clip_frac = jnp.mean((jnp.abs(ratio - 1.0) > cfg.clip_range).astype(jnp.float32))
        approx_kl = jnp.mean(old_log_probs - log_prob)
        aux = dict(
            policy_loss=pg_loss,
            value_loss=v_loss,
            entropy=ent,
            clip_fraction=clip_frac,
            approx_kl=approx_kl,
        )
        return loss, aux

    # -- update --------------------------------------------------------------

    def update(
        self, state: TrainState, *, axis_name: str | None = None
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """One PPO iteration.  If axis_name is set (inside shard_map), the
        gradient and the scalar metrics are psum-averaged across shards."""
        cfg = self.cfg
        state, batch, last_values, stats = self.rollout(state)
        advantages, returns = compute_gae(
            batch.rewards,
            batch.values,
            batch.dones,
            last_values,
            gamma=cfg.gamma,
            gae_lambda=cfg.gae_lambda,
        )

        B = cfg.n_steps * self.num_envs
        stacked = (batch.obs, batch.actions, batch.log_probs, advantages, returns)

        def mb_step(carry, mb_data):
            params, opt_state = carry
            (loss, aux), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                params, *mb_data, axis_name=axis_name
            )
            if axis_name is not None:
                grads = jax.lax.pmean(grads, axis_name)
                loss = jax.lax.pmean(loss, axis_name)
                aux = jax.lax.pmean(aux, axis_name)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, aux)

        if cfg.shuffle == "timeperm":
            # Gather-free shuffle.  Profiling (docs/RESULTS.md r2) showed the
            # SGD phase is GATHER-bound: every epoch re-reads the whole batch
            # through a random-row gather (explicitly per minibatch, or
            # implicitly via a materialized permutation — same bytes, same
            # cost), ~3x the compute floor.  Here each epoch permutes only
            # the TIME axis — n_steps contiguous (num_envs x feat) blocks
            # move at HBM streaming speed — and minibatches are contiguous
            # slices: every minibatch holds ALL envs at n_steps/num_minibatches
            # random timesteps.  Statistically close to exact shuffling (a
            # uniformly shuffled minibatch also averages ~minibatch/num_envs
            # samples per env); validated at quality parity in RESULTS.md.
            def epoch_body(carry, _):
                params, opt_state, rng = carry
                rng, k_perm = jax.random.split(rng)
                perm = jax.random.permutation(k_perm, cfg.n_steps)
                xs = jax.tree.map(
                    lambda x: x[perm].reshape(
                        (cfg.num_minibatches, self.minibatch_size) + x.shape[2:]
                    ),
                    stacked,
                )
                (params, opt_state), (losses, auxes) = jax.lax.scan(
                    mb_step, (params, opt_state), xs
                )
                return (params, opt_state, rng), (losses, auxes)
        else:
            flat = jax.tree.map(lambda x: x.reshape((B,) + x.shape[2:]), stacked)

            def epoch_body(carry, _):
                params, opt_state, rng = carry
                rng, k_perm = jax.random.split(rng)
                # Shuffle the 4-byte INDICES and gather each minibatch inside
                # the scan (materializing a shuffled batch copy per epoch was
                # measured slower; same gathered bytes plus a full write).
                if cfg.shuffle == "exact":
                    perm = jax.random.permutation(k_perm, B)
                else:  # 'affine': sort-free random affine bijection i -> a*i+b
                    # (mod B).  a odd and B a power of two -> a is invertible,
                    # so this is a true permutation, just not uniformly
                    # distributed over all B! orderings.  Minibatch composition
                    # still mixes across epochs.
                    ka, kb = jax.random.split(k_perm)
                    a = (jax.random.randint(ka, (), 0, B // 2) * 2 + 1).astype(jnp.uint32)
                    b = jax.random.randint(kb, (), 0, B).astype(jnp.uint32)
                    perm = (a * jnp.arange(B, dtype=jnp.uint32) + b) % B
                idx_mb = perm.reshape(cfg.num_minibatches, self.minibatch_size)

                def mb_body(carry, idx):
                    return mb_step(carry, jax.tree.map(lambda x: x[idx], flat))

                (params, opt_state), (losses, auxes) = jax.lax.scan(
                    mb_body, (params, opt_state), idx_mb
                )
                return (params, opt_state, rng), (losses, auxes)

        (params, opt_state, rng), (losses, auxes) = jax.lax.scan(
            epoch_body, (state.params, state.opt_state, state.rng), None,
            length=cfg.n_epochs,
        )

        metrics = {"loss": jnp.mean(losses)}
        for k, v in auxes.items():
            metrics[k] = jnp.mean(v)
        if axis_name is not None:
            # episode stats are per-shard sums -> psum them; rates re-derive
            stats = jax.tree.map(lambda x: jax.lax.psum(x, axis_name), stats)
        ep = stats.summary()
        episodes_total = state.episodes_total + stats.n_episodes
        metrics.update({f"episodes/{k}": v for k, v in ep.items()})
        metrics["episodes/total"] = episodes_total
        metrics["global_step"] = state.global_step

        new_state = state._replace(
            params=params, opt_state=opt_state, rng=rng,
            episodes_total=episodes_total,
            family_counts=state.family_counts + stats.family_counts,
            family_wins=state.family_wins + stats.family_wins,
        )
        return new_state, metrics

    # convenience jitted single-device update
    @partial(jax.jit, static_argnums=0)
    def update_jit(self, state: TrainState):
        return self.update(state)
