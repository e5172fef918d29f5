"""Training driver — the `mode == "train"` path of reference `main.py:149-210`
as a real CLI instead of edit-the-source mode switching (`main.py:104-133`).

    python -m drone2d_tpu.train --total-timesteps 9000000 --num-envs 4096

Maps the reference pipeline to TPU:
  SubprocVecEnv(cpu_count-2)          -> env batch sharded over jax.devices()
  PPO("MlpPolicy", ent_coef=0.01)     -> drone2d_tpu.learn.PPOLearner
  CheckpointCallback(100000//n_cpu)   -> orbax save every checkpoint_every_steps
  TensorboardLogger                   -> MetricsWriter (JSONL + TB)
  curriculum via checkpoint glob      -> global_step carried in TrainState
  model.save('new_agent')             -> final checkpoint + params .npz
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from drone2d_tpu.config import (
    PRESETS,
    EnvConfig,
    PPOConfig,
    TrainConfig,
    apply_preset,
)
from drone2d_tpu.learn.ppo import PPOLearner
from drone2d_tpu.parallel import make_mesh, shard_init, shard_update
from drone2d_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
from drone2d_tpu.utils.metrics import MetricsWriter


def _add_dataclass_args(
    parser: argparse.ArgumentParser, prefix: str, cls, *, suppress: bool = False
) -> None:
    for f in dataclasses.fields(cls):
        if not isinstance(f.default, (int, float, str, bool)):
            continue
        name = f"--{prefix.replace('_', '-')}{f.name.replace('_', '-')}"
        default = argparse.SUPPRESS if suppress else f.default
        if isinstance(f.default, bool):
            parser.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=default, metavar="BOOL")
        else:
            parser.add_argument(name, type=type(f.default), default=default)


def _collect(args, prefix: str, cls):
    kw = {}
    for f in dataclasses.fields(cls):
        key = f"{prefix}{f.name}"
        if hasattr(args, key):
            kw[f.name] = getattr(args, key)
    return cls(**kw)


def build_parser(*, suppress: bool = False) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    _add_dataclass_args(p, "", TrainConfig, suppress=suppress)
    _add_dataclass_args(p, "env_", EnvConfig, suppress=suppress)
    _add_dataclass_args(p, "ppo_", PPOConfig, suppress=suppress)
    p.add_argument(
        "--preset", default=None, choices=sorted(PRESETS),
        help="published training recipe (config.PRESETS) applied over the "
        "defaults; explicit flags still win — e.g. --preset flagship-scratch",
    )
    p.add_argument("--resume", action="store_true", help="resume from latest checkpoint")
    p.add_argument("--max-updates", type=int, default=0, help="stop after N updates (0 = by timesteps)")
    p.add_argument(
        "--init-params", default=None, metavar="NPZ_OR_CKPT_DIR",
        help="warm-start: initialize policy params from a saved agent "
        "(.npz or orbax dir) with a FRESH optimizer, env batch, and "
        "global_step — e.g. rehearsal fine-tuning of a trained agent on a "
        "different episode mix. Unlike --resume, nothing else is restored.",
    )
    return p


def train(
    train_cfg: TrainConfig,
    env_cfg: EnvConfig,
    ppo_cfg: PPOConfig,
    *,
    resume: bool = False,
    max_updates: int = 0,
    init_params: str | None = None,
) -> None:
    learner = PPOLearner(env_cfg, ppo_cfg, train_cfg.num_envs)
    if env_cfg.adaptive_rehearsal and float(
        np.sum(np.asarray(learner.initial_rehearsal_probs()))
    ) <= 0.0:
        raise ValueError(
            "adaptive_rehearsal=True with a zero rehearsal budget is a "
            "silent no-op: the mix knobs define the total budget the "
            "controller redistributes — set stage_mix_prob (and/or "
            "corridor_mix_prob, cross_mix_prob) > 0"
        )
    mesh = make_mesh()
    key = jax.random.PRNGKey(train_cfg.seed)

    start_step = 0
    if resume:
        state, start_step = restore_checkpoint(train_cfg.checkpoint_dir, learner, key)
        print(f"resumed from step {start_step}")
    else:
        state = shard_init(mesh, learner, key)
        if init_params:
            # warm-start the policy only; optimizer/env/global_step stay
            # fresh (a fine-tune, not a resume)
            from drone2d_tpu.eval.run import load_params

            loaded = load_params(init_params)
            loaded = jax.tree.map(
                lambda new, old: jax.device_put(
                    jnp.asarray(new, old.dtype), old.sharding
                ),
                loaded, state.params,
            )
            state = state._replace(params=loaded)
            print(f"warm-started params from {init_params}")

    upd = shard_update(mesh, learner)
    writer = MetricsWriter(
        train_cfg.metrics_path,
        tensorboard_dir=f"{train_cfg.checkpoint_dir}/tb",
        resume=resume,
    )
    writer.write_config_snapshot(
        train_cfg.checkpoint_dir,
        env_train_config=env_cfg, rl_config=ppo_cfg, train_config=train_cfg,
    )

    steps_per_update = ppo_cfg.n_steps * train_cfg.num_envs
    next_ckpt = (start_step // train_cfg.checkpoint_every_steps + 1) * train_cfg.checkpoint_every_steps
    n_updates = 0
    gs = start_step
    plr_last = (
        np.asarray(jax.device_get(state.family_counts)),
        np.asarray(jax.device_get(state.family_wins)),
    )
    t0 = time.perf_counter()
    try:
        while True:
            state, metrics = upd(state)
            n_updates += 1
            # host-side step bookkeeping: NO device_get between logging
            # updates, so dispatch pipelines ahead of the device (on a
            # tunneled TPU a per-update sync would serialize every RPC)
            gs += steps_per_update
            if n_updates == 1:
                # first update is dominated by XLA compilation; restart the
                # throughput clock so steps/s reflects steady state.
                # device_get, not block_until_ready: the latter has been
                # observed returning before the remote backend's dispatch
                # queue drains, which would fold compile time into the rate
                float(np.asarray(jax.device_get(metrics["loss"])))
                t0 = time.perf_counter()
            if n_updates % train_cfg.log_every_updates == 0:
                m = {k: float(np.asarray(v)) for k, v in jax.device_get(metrics).items()}
                # cumulative episodes accumulated on device (exact across
                # skipped updates and across resume)
                writer.set_episodes_total(int(m.pop("episodes/total")))
                if env_cfg.adaptive_rehearsal and env_cfg.rehearsal_adapt:
                    # PLR-lite controller tick: reweight rehearsal families
                    # by their measured failure rates since the last tick
                    # (learn/plr.py); re-enters the jitted update as data
                    from drone2d_tpu.learn.plr import family_report, reweight_rehearsal

                    counts, wins, probs = (
                        np.asarray(jax.device_get(state.family_counts)),
                        np.asarray(jax.device_get(state.family_wins)),
                        np.asarray(jax.device_get(state.rehearsal_probs)),
                    )
                    dc, dw = counts - plr_last[0], wins - plr_last[1]
                    plr_last = (counts, wins)
                    new_probs = reweight_rehearsal(probs, dc, dw)
                    state = state._replace(
                        rehearsal_probs=jax.device_put(
                            jnp.asarray(new_probs), state.rehearsal_probs.sharding
                        )
                    )
                    from drone2d_tpu.env.types import FAMILY_NAMES

                    for f, name in enumerate(FAMILY_NAMES[1:]):
                        m[f"rehearsal/p_{name}"] = float(new_probs[f])
                    print("  rehearsal:", family_report(dc, dw),
                          "->", np.round(new_probs, 3))
                rate = steps_per_update * max(n_updates - 1, 1) / max(
                    time.perf_counter() - t0, 1e-9
                )
                m["throughput/env_steps_per_s"] = rate
                writer.write(gs, m)
                print(
                    f"step {gs:>9d}  loss {m['loss']:8.3f}  "
                    f"ep_ret {m['episodes/avg_total_reward']:8.2f}  "
                    f"sr {m['episodes/success_rate']:.2f}  {rate:,.0f} steps/s"
                )
            if gs >= next_ckpt:
                save_checkpoint(train_cfg.checkpoint_dir, state)
                next_ckpt += train_cfg.checkpoint_every_steps
            if gs >= train_cfg.total_timesteps:
                break
            if max_updates and n_updates >= max_updates:
                break
    finally:
        # final save (reference model.save('new_agent'), main.py:209)
        step = save_checkpoint(train_cfg.checkpoint_dir, state, wait=True)
        from drone2d_tpu.models.policy import params_to_flat_dict

        flat = {
            k: np.asarray(v)
            for k, v in params_to_flat_dict(jax.device_get(state.params)).items()
        }
        np.savez(f"{train_cfg.checkpoint_dir}/new_agent.npz", **flat)
        writer.close()
        print(f"saved final checkpoint at step {step}")


def main(argv=None) -> None:
    from drone2d_tpu.utils.runtime import setup_runtime, wait_for_accelerator

    setup_runtime()
    args = build_parser().parse_args(argv)
    train_cfg = _collect(args, "", TrainConfig)
    env_cfg = _collect(args, "env_", EnvConfig)
    ppo_cfg = _collect(args, "ppo_", PPOConfig)
    if args.preset:
        # keys the user typed explicitly (suppressed-defaults twin parse)
        provided = set(
            vars(build_parser(suppress=True).parse_known_args(argv)[0])
        )
        env_cfg, ppo_cfg, train_cfg = apply_preset(
            args.preset, env_cfg, ppo_cfg, train_cfg, provided
        )
        print(f"preset {args.preset!r}: {PRESETS[args.preset]['doc']}")
    if not wait_for_accelerator():
        raise SystemExit(
            "accelerator backend unavailable; aborting instead of hanging"
        )
    train(
        train_cfg,
        env_cfg,
        ppo_cfg,
        resume=args.resume,
        max_updates=args.max_updates,
        init_params=args.init_params,
    )


if __name__ == "__main__":
    main()
