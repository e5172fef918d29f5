"""Flagship recipe presets (VERDICT r4 #3): the published-quality recipes
are committed, machine-applied configs — not prose archaeology.  These tests
pin the recipe contents to the round-4 evidence and the override precedence
(explicit CLI flags beat the preset, preset beats defaults)."""

import pytest

from drone2d_tpu.config import (
    PRESETS,
    EnvConfig,
    PPOConfig,
    TrainConfig,
    apply_preset,
)


def test_flagship_scratch_contents():
    """The hunt-7 from-scratch recipe exactly (docs/RESULTS.md round 4:
    three strict n=1000 finalists from 24 seeds of this)."""
    env, ppo, tr = apply_preset(
        "flagship-scratch", EnvConfig(), PPOConfig(), TrainConfig()
    )
    assert env.PP_rew_max == 8.0
    assert env.rew_collision == -70.0
    assert env.abs_inv_CA_min_rew == pytest.approx(1 / 6)
    assert env.curriculum_scale == 4.0
    assert env.obstacle_radius_max == 160.0
    assert env.stage_mix_prob == 0.25
    assert env.adaptive_rehearsal is False  # h7 used the fixed stage mix
    assert ppo.hidden_sizes == (128, 128)
    assert (ppo.n_steps, ppo.num_minibatches) == (128, 64)
    assert ppo.shuffle == "timeperm"
    assert tr.total_timesteps == 150_000_000 and tr.num_envs == 1024
    # knobs the preset does NOT touch stay at reference defaults
    assert env.PP_vel_scale == EnvConfig().PP_vel_scale
    assert ppo.ent_coef == PPOConfig().ent_coef


def test_flagship_finetune_contents():
    """The hunt-8 pace fine-tune recipe (produced the shipped agent_s8004)."""
    env, ppo, tr = apply_preset(
        "flagship-finetune", EnvConfig(), PPOConfig(), TrainConfig()
    )
    assert env.PP_rew_max == 8.0
    assert env.curriculum_scale == 0.05
    assert env.stage_mix_prob == 0.3
    assert env.stage_mix_weights == (3.0, 1.0, 1.0, 1.0, 1.0)
    assert env.adaptive_rehearsal is True and env.rehearsal_adapt is False
    assert ppo.hidden_sizes == (128, 128)
    assert tr.total_timesteps == 30_000_000


def test_explicit_flags_beat_preset():
    env, ppo, tr = apply_preset(
        "flagship-scratch", EnvConfig(PP_rew_max=5.0), PPOConfig(),
        TrainConfig(total_timesteps=7),
        provided={"env_PP_rew_max", "total_timesteps"},
    )
    assert env.PP_rew_max == 5.0          # user's value survives
    assert env.curriculum_scale == 4.0    # preset still fills the rest
    assert tr.total_timesteps == 7


def test_train_cli_preset_roundtrip():
    """The train CLI's twin-parser provided-key detection: a preset plus an
    explicit override yields the overridden value, everything else preset."""
    from drone2d_tpu.train import _collect, build_parser

    argv = ["--preset", "flagship-scratch", "--env-PP-rew-max", "5"]
    args = build_parser().parse_args(argv)
    provided = set(vars(build_parser(suppress=True).parse_known_args(argv)[0]))
    env, ppo, tr = apply_preset(
        args.preset,
        _collect(args, "env_", EnvConfig),
        _collect(args, "ppo_", PPOConfig),
        _collect(args, "", TrainConfig),
        provided,
    )
    assert env.PP_rew_max == 5.0
    assert env.rew_collision == -70.0
    assert ppo.hidden_sizes == (128, 128)
    assert tr.total_timesteps == 150_000_000


def test_sweep_preset_pairs_parse():
    """sweep.py expands preset sections into KEY=VALUE pairs; every pair in
    both presets must round-trip through its parse_overrides (tuples, bools,
    fractions included), with explicit pairs appended later winning."""
    import importlib

    sweep = importlib.import_module("scripts.sweep")
    for name, preset in PRESETS.items():
        for section, defaults in (("env", EnvConfig()), ("ppo", PPOConfig())):
            pairs = [
                f"{k}={','.join(map(str, v)) if isinstance(v, tuple) else v}"
                for k, v in preset.get(section, {}).items()
            ]
            parsed = sweep.parse_overrides(pairs, defaults)
            for k, v in preset.get(section, {}).items():
                assert parsed[k] == v, (name, section, k)
    # precedence: later (explicit) pair beats the preset pair
    out = sweep.parse_overrides(
        ["PP_rew_max=8", "PP_rew_max=3.5"], EnvConfig()
    )
    assert out["PP_rew_max"] == 3.5
