"""Training driver + checkpoint/resume tests (SURVEY.md §5.3-5.4)."""

import json
import os

import numpy as np
import jax
import pytest

from drone2d_tpu.config import EnvConfig, PPOConfig, TrainConfig
from drone2d_tpu.learn.ppo import PPOLearner
from drone2d_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

SMALL_ENV = dict(path_table_n=128, n_steps=64)
SMALL_PPO = dict(n_steps=8, num_minibatches=4, n_epochs=2)


def test_checkpoint_roundtrip(tmp_path):
    learner = PPOLearner(EnvConfig(**SMALL_ENV), PPOConfig(**SMALL_PPO), num_envs=8)
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    state, _ = learner.update_jit(state)

    step = save_checkpoint(str(tmp_path / "ckpt"), state, wait=True)
    assert step == 8 * 8

    restored, rstep = restore_checkpoint(
        str(tmp_path / "ckpt"), learner, jax.random.PRNGKey(1)
    )
    assert rstep == step
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the restored state trains on
    state2, metrics = learner.update_jit(restored)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.global_step) == 2 * 8 * 8


def test_restore_checkpoint_without_episodes_total(tmp_path):
    """Checkpoints written before TrainState.episodes_total existed lack the
    key; restore must tolerate them (counter seeds at 0) instead of orbax
    rejecting the template as a tree-structure mismatch."""
    import orbax.checkpoint as ocp

    learner = PPOLearner(EnvConfig(**SMALL_ENV), PPOConfig(**SMALL_PPO), num_envs=8)
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    state, _ = learner.update_jit(state)

    # simulate the old save format: same payload minus episodes_total
    step = int(np.asarray(jax.device_get(state.global_step)))
    payload = dict(
        params=jax.device_get(state.params),
        opt_state=jax.device_get(state.opt_state),
        rng=jax.device_get(jax.random.key_data(state.rng)),
        global_step=step,
    )
    mgr = ocp.CheckpointManager(
        os.path.abspath(str(tmp_path / "old_ckpt")),
        options=ocp.CheckpointManagerOptions(create=True),
    )
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()

    restored, rstep = restore_checkpoint(
        str(tmp_path / "old_ckpt"), learner, jax.random.PRNGKey(1)
    )
    assert rstep == step
    assert int(np.asarray(restored.episodes_total)) == 0
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_global_step_counts_past_int32_wrap():
    """TrainState.global_step is a float32 counter advanced by one exact add
    of n_steps*step_increment per update — it must keep counting exactly past
    the int32 wrap at 2^31 (VERDICT r1 weak #5)."""
    import jax.numpy as jnp

    learner = PPOLearner(
        EnvConfig(**SMALL_ENV), PPOConfig(**SMALL_PPO), num_envs=8,
        step_increment=2**14,
    )
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    state = state._replace(global_step=jnp.float32(2.0**31))
    state, metrics = learner.update_jit(state)
    assert float(state.global_step) == 2.0**31 + 8 * 2**14
    assert float(metrics["global_step"]) == 2.0**31 + 8 * 2**14


def test_device_episode_accumulator():
    """TrainState.episodes_total accumulates every update's episode count on
    device, so the train loop needs no per-update host sync (and the count
    survives checkpoint resume)."""
    learner = PPOLearner(EnvConfig(**SMALL_ENV), PPOConfig(**SMALL_PPO), num_envs=8)
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    total = 0.0
    for _ in range(3):
        state, m = learner.update_jit(state)
        total += float(m["episodes/episodes"])
        assert float(m["episodes/total"]) == total
        assert float(state.episodes_total) == total


def test_metrics_episode_accounting(tmp_path):
    """Cumulative time/episodes counts EVERY update's episodes even when only
    every 3rd update is logged, and survives resume (VERDICT r1 next #4)."""
    from drone2d_tpu.utils.metrics import MetricsWriter

    p = str(tmp_path / "metrics.jsonl")
    w = MetricsWriter(p)
    for i in range(9):
        w.add_episodes(5)  # every update
        if (i + 1) % 3 == 0:  # log_every_updates = 3
            w.write(i, {"episodes/episodes": 5.0})
    w.close()
    rows = [json.loads(l) for l in open(p)]
    assert [r["time/episodes"] for r in rows] == [15, 30, 45]

    # resume seeds the counter from the last row instead of restarting at 0
    w2 = MetricsWriter(p, resume=True)
    assert w2.episodes_total == 45
    w2.add_episodes(2)
    w2.write(9, {})
    w2.close()
    rows = [json.loads(l) for l in open(p)]
    assert rows[-1]["time/episodes"] == 47


def test_train_cli_end_to_end(tmp_path):
    from drone2d_tpu.train import train

    ckpt = str(tmp_path / "logs")
    train(
        TrainConfig(
            total_timesteps=128, num_envs=8, checkpoint_every_steps=64,
            checkpoint_dir=ckpt, metrics_path=f"{ckpt}/metrics.jsonl",
        ),
        EnvConfig(**SMALL_ENV),
        PPOConfig(**SMALL_PPO),
    )
    assert os.path.exists(f"{ckpt}/new_agent.npz")
    rows = [json.loads(l) for l in open(f"{ckpt}/metrics.jsonl")]
    assert rows and "episodes/avg_reward" in rows[-1]
    assert rows[-1]["global_step"] == 128
    # config snapshots written separately (not overwriting each other —
    # the reference bug at main.py:170-174 is not replicated)
    assert os.path.exists(f"{ckpt}/env_train_config.txt")
    assert os.path.exists(f"{ckpt}/rl_config.txt")

    # resume continues from the saved step
    train(
        TrainConfig(
            total_timesteps=192, num_envs=8, checkpoint_every_steps=64,
            checkpoint_dir=ckpt, metrics_path=f"{ckpt}/metrics.jsonl",
        ),
        EnvConfig(**SMALL_ENV),
        PPOConfig(**SMALL_PPO),
        resume=True,
    )
    rows = [json.loads(l) for l in open(f"{ckpt}/metrics.jsonl")]
    assert rows[-1]["global_step"] == 192


def test_train_warm_start_from_npz(tmp_path):
    """--init-params fine-tune: params come from the saved agent, while
    optimizer/env/global_step start fresh (unlike --resume)."""
    import numpy as np

    from drone2d_tpu.eval.run import load_params
    from drone2d_tpu.models.policy import params_to_flat_dict
    from drone2d_tpu.train import train

    base = str(tmp_path / "base")
    train(
        TrainConfig(
            total_timesteps=128, num_envs=8, checkpoint_every_steps=64,
            checkpoint_dir=base, metrics_path=f"{base}/metrics.jsonl",
        ),
        EnvConfig(**SMALL_ENV),
        PPOConfig(**SMALL_PPO),
    )

    ft = str(tmp_path / "ft")
    train(
        TrainConfig(
            total_timesteps=64, num_envs=8, checkpoint_every_steps=64,
            checkpoint_dir=ft, metrics_path=f"{ft}/metrics.jsonl",
        ),
        EnvConfig(**SMALL_ENV),
        PPOConfig(**SMALL_PPO),
        init_params=f"{base}/new_agent.npz",
    )
    rows = [json.loads(l) for l in open(f"{ft}/metrics.jsonl")]
    assert rows[-1]["global_step"] == 64  # fresh step counter, not resumed

    # the fine-tuned agent genuinely started from the base params: one
    # update at lr>0 moves them, so require close-but-not-unrelated — the
    # relative drift after 1 tiny update is small vs typical param scale
    a = params_to_flat_dict(load_params(f"{base}/new_agent.npz"))
    b = params_to_flat_dict(load_params(f"{ft}/new_agent.npz"))
    for k in a:
        diff = float(np.max(np.abs(np.asarray(a[k]) - np.asarray(b[k]))))
        assert diff < 0.1, (k, diff)
