"""Vmapped population (zoo) training tests — learn/zoo.py."""

import numpy as np
import jax
import jax.numpy as jnp

from drone2d_tpu.config import EnvConfig, PPOConfig
from drone2d_tpu.learn.zoo import ZooTrainer, save_zoo, train_zoo

SMALL_ENV = dict(path_table_n=128, golden_iters=8)
SMALL_PPO = dict(n_steps=8, num_minibatches=4, n_epochs=2)


def test_zoo_update_shapes_and_divergence():
    trainer = ZooTrainer(EnvConfig(**SMALL_ENV), PPOConfig(**SMALL_PPO), num_envs=8)
    state = trainer.init([0, 1, 2])
    assert state.params.log_std.shape[0] == 3
    state2, metrics = trainer.update(state)
    # every metric carries the population axis
    assert metrics["loss"].shape == (3,)
    assert metrics["episodes/success_rate"].shape == (3,)
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))
    # different seeds actually diverge (different init + episodes)
    w = np.asarray(state2.params.pi[0].w)
    assert not np.allclose(w[0], w[1])
    assert float(state2.global_step[0]) == 8 * 8


def test_zoo_sharded_population_over_mesh():
    """Population axis sharded over the 8-device CPU mesh: updates run with
    per-device seed slices and no collectives (embarrassingly parallel)."""
    from drone2d_tpu.learn.zoo import shard_population
    from drone2d_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    n_dev = mesh.devices.size
    trainer = ZooTrainer(EnvConfig(**SMALL_ENV), PPOConfig(**SMALL_PPO), num_envs=8)
    state = shard_population(trainer.init(list(range(n_dev))), mesh)
    # the claim is literal: the compiled module contains NO collectives (the
    # population axis is embarrassingly parallel; docs/RESULTS.md projects
    # pod scaling from exactly this property)
    hlo = jax.jit(trainer.update).lower(state).compile().as_text()
    for op in ("all-reduce", "all-gather", "collective-permute",
               "reduce-scatter", "all-to-all"):
        # INTENT: the population-axis update must compile with zero
        # cross-device communication.  This greps compiled-HLO op names,
        # which is brittle across XLA upgrades (ADVICE r4) — if an upgrade
        # renames collectives, re-pin the list rather than weakening the
        # no-communication claim.
        assert op not in hlo, (
            f"collective '{op}' appeared in the population update HLO — "
            f"either a real sharding regression (the population axis must "
            f"stay embarrassingly parallel) or an XLA op-name churn"
        )
    state2, metrics = trainer.update(state)
    assert metrics["loss"].shape == (n_dev,)
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))
    # output keeps the population sharding (no implicit gather to one device)
    shd = state2.params.log_std.sharding
    assert not shd.is_fully_replicated
    # members still diverge per-seed
    w = np.asarray(state2.params.pi[0].w)
    assert not np.allclose(w[0], w[1])
    # indivisible population is rejected
    import pytest
    with pytest.raises(ValueError, match="divisible"):
        shard_population(trainer.init(list(range(n_dev + 1))), mesh)


def test_train_zoo_writes_selectable_artifacts(tmp_path):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from select_agents import find_candidates

    from drone2d_tpu.eval.run import load_params

    out = str(tmp_path / "zoo")
    train_zoo(
        EnvConfig(**SMALL_ENV), PPOConfig(**SMALL_PPO), 8,
        seeds=[5, 6], total_timesteps=4 * 8 * 8, out_root=out,
        snapshots=1, log_every=2,
    )
    cands = find_candidates([f"{out}/seed_5", f"{out}/seed_6"])
    labels = [l for l, _, _ in cands]
    assert "seed_5/final" in labels and "seed_6/final" in labels
    assert any(l.startswith("seed_5/") and l != "seed_5/final" for l in labels), (
        "snapshot ckpt_<step>.npz should be discovered: %s" % labels
    )
    for _, path, step in cands:
        p = load_params(path, step)
        assert np.all(np.isfinite(np.asarray(p.log_std)))


def test_train_zoo_snapshot_steps(tmp_path):
    """snapshot_steps snapshots at the first update reaching each requested
    env-step count (the sample-efficiency-frontier cadence)."""
    import os

    out = str(tmp_path / "zoo")
    spu = 8 * 8  # num_envs * n_steps
    train_zoo(
        EnvConfig(**SMALL_ENV), PPOConfig(**SMALL_PPO), 8,
        seeds=[7], total_timesteps=6 * spu, out_root=out,
        snapshot_steps=[1, 3 * spu], log_every=10,
    )
    files = set(os.listdir(f"{out}/seed_7"))
    # step 1 rounds up to the first update (1*spu); 3*spu lands exactly
    assert files == {f"ckpt_{spu}.npz", f"ckpt_{3*spu}.npz", "new_agent.npz"}, files


def test_train_zoo_warm_start(tmp_path):
    """Population fine-tuning: every member starts from the same saved
    agent's policy (optimizer/env/rng stay per-seed), and mismatched
    capacities are rejected."""
    import pytest

    # save a source agent
    trainer = ZooTrainer(EnvConfig(**SMALL_ENV), PPOConfig(**SMALL_PPO), num_envs=8)
    src = trainer.init([11])
    [src_path] = save_zoo(src, [11], str(tmp_path / "src"))

    out = str(tmp_path / "ft")
    state = train_zoo(EnvConfig(**SMALL_ENV), PPOConfig(**SMALL_PPO), 8,
                      [0, 1], 8 * 8, out, snapshots=0, init_params=src_path)
    # one update from a shared start: members have begun to diverge but both
    # trained FROM the source (not from their seed inits)
    w = np.asarray(state.params.pi[0].w)
    src_w = np.asarray(jax.tree.map(lambda x: x[0], src.params).pi[0].w)
    assert np.abs(w - src_w).max() < 0.1          # one small step away
    fresh = trainer.init([0, 1])
    assert np.abs(np.asarray(fresh.params.pi[0].w) - src_w).max() > 0.1

    with pytest.raises(ValueError, match="hidden_sizes"):
        train_zoo(EnvConfig(**SMALL_ENV),
                  PPOConfig(**SMALL_PPO, hidden_sizes=(32, 32)), 8,
                  [0], 8 * 8, out, snapshots=0, init_params=src_path)
