"""PLR-lite adaptive rehearsal — learn/plr.py + the adaptive env/learner path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drone2d_tpu.config import EnvConfig, PPOConfig
from drone2d_tpu.env.env import Drone2DEnv
from drone2d_tpu.learn.plr import reweight_rehearsal
from drone2d_tpu.learn.ppo import PPOLearner

SMALL = dict(path_table_n=128, golden_iters=8)


# -- controller math ---------------------------------------------------------

def test_reweight_budget_conserved_and_failure_weighted():
    probs = np.array([0.05] * 5 + [0.0, 0.0], np.float32)
    counts = np.zeros(8); wins = np.zeros(8)
    counts[1:6] = 100.0                       # stages 1-5 measured
    wins[1:6] = [100, 100, 100, 100, 0]       # stage_5 always fails
    new = reweight_rehearsal(probs, counts, wins, ema=1.0, floor_frac=0.05)
    assert new.sum() == pytest.approx(0.25, abs=1e-6)   # budget fixed
    assert new[4] > new[0]                               # failing family gains
    # floor: every active family keeps >= floor_frac of the budget
    assert np.all(new[:5] >= 0.05 * 0.25 - 1e-6)
    # inactive families (corridor/cross started at 0) stay at 0
    assert new[5] == 0.0 and new[6] == 0.0


def test_reweight_unmeasured_family_keeps_share():
    probs = np.array([0.1, 0.1, 0.0, 0.0, 0.0, 0.05, 0.0], np.float32)
    counts = np.zeros(8); wins = np.zeros(8)
    counts[1] = 50; wins[1] = 50        # stage_1 measured, perfect
    counts[2] = 2; wins[2] = 0          # stage_2 under min_episodes
    new = reweight_rehearsal(probs, counts, wins, ema=1.0, min_episodes=8)
    assert new.sum() == pytest.approx(0.25, abs=1e-6)
    # the measured-perfect family should not gain over the unmeasured ones
    assert new[0] <= probs[0] + 1e-6


def test_reweight_broadcasts_over_population():
    probs = np.tile(np.array([0.05] * 5 + [0.0, 0.0], np.float32), (3, 1))
    counts = np.zeros((3, 8)); wins = np.zeros((3, 8))
    counts[:, 1:6] = 100
    wins[0, 1:6] = [0, 100, 100, 100, 100]   # member 0 fails stage_1
    wins[1, 1:6] = [100, 100, 100, 100, 0]   # member 1 fails stage_5
    wins[2, 1:6] = 100
    new = reweight_rehearsal(probs, counts, wins, ema=1.0)
    assert new.shape == (3, 7)
    assert np.argmax(new[0]) == 0 and np.argmax(new[1]) == 4
    np.testing.assert_allclose(new.sum(-1), 0.25, atol=1e-6)


# -- adaptive env sampling ---------------------------------------------------

def test_adaptive_reset_zero_probs_matches_static_path():
    """With all-zero probs the adaptive reset is bit-identical to the static
    (no-rehearsal) reset — the knob must not perturb the baseline."""
    cfg_s = EnvConfig(**SMALL)
    cfg_a = cfg_s.replace(adaptive_rehearsal=True)
    key = jax.random.PRNGKey(3)
    s_state, s_obs = jax.jit(
        lambda k: Drone2DEnv(cfg_s).reset_batch(k, 8, 0)
    )(key)
    a_state, a_obs = jax.jit(
        lambda k, p: Drone2DEnv(cfg_a).reset_batch(k, 8, 0, p)
    )(key, jnp.zeros(7, jnp.float32))
    np.testing.assert_array_equal(np.asarray(s_obs), np.asarray(a_obs))
    for a, b in zip(jax.tree.leaves(s_state), jax.tree.leaves(a_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.all(np.asarray(a_state.family) == 0)


@pytest.mark.parametrize("fam_idx,probs", [
    (3, [0, 0, 1.0, 0, 0, 0, 0]),   # all mass on stage_3 -> family 3
    (6, [0, 0, 0, 0, 0, 1.0, 0]),   # corridor
    (7, [0, 0, 0, 0, 0, 0, 1.0]),   # cross
])
def test_adaptive_reset_respects_family_probs(fam_idx, probs):
    cfg = EnvConfig(**SMALL, adaptive_rehearsal=True)
    env = Drone2DEnv(cfg)
    state, _ = jax.jit(
        lambda k, p: env.reset_batch(k, 32, 0, p)
    )(jax.random.PRNGKey(0), jnp.asarray(probs, jnp.float32))
    assert np.all(np.asarray(state.family) == fam_idx), np.asarray(state.family)


def test_adaptive_reset_requires_probs():
    cfg = EnvConfig(**SMALL, adaptive_rehearsal=True)
    with pytest.raises(ValueError, match="rehearsal_probs"):
        Drone2DEnv(cfg).reset(jax.random.PRNGKey(0), 0)


def test_stage_override_immune_to_adaptive_mix():
    """Forced-stage eval scenarios (scenario='stage_k') must never draw
    rehearsal episodes, adaptive or not."""
    cfg = EnvConfig(**SMALL, adaptive_rehearsal=True, scenario="stage_2",
                    mode="curriculum")
    env = Drone2DEnv(cfg)
    state, _ = jax.jit(
        lambda k, p: env.reset_batch(k, 16, 0, p)
    )(jax.random.PRNGKey(0), jnp.asarray([0, 0, 0, 0, 0, 0, 1.0]))
    assert np.all(np.asarray(state.family) == 0)


# -- learner accounting ------------------------------------------------------

def test_family_counts_accumulate_in_training():
    """All rehearsal mass on stage_1 (trivial no-obstacle episodes): finished
    episodes must all land in family 1 and wins must track counts."""
    cfg = EnvConfig(**SMALL, adaptive_rehearsal=True)
    learner = PPOLearner(
        cfg, PPOConfig(n_steps=48, num_minibatches=4, n_epochs=1), num_envs=16
    )
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    state = state._replace(
        rehearsal_probs=jnp.asarray([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)
    )
    for _ in range(3):
        state, metrics = learner.update_jit(state)
    counts = np.asarray(state.family_counts)
    wins = np.asarray(state.family_wins)
    assert counts[1] > 0, counts
    # family 0 holds only the envs' FIRST episodes (reset at init, before the
    # probs override); every auto-reset replacement must be family 1
    assert counts[0] <= 16, counts
    assert counts[2:].sum() == 0, counts
    assert 0 <= wins[1] <= counts[1]
    # static (non-adaptive) learner leaves the accounting untouched
    learner_s = PPOLearner(
        EnvConfig(**SMALL), PPOConfig(n_steps=8, num_minibatches=2, n_epochs=1),
        num_envs=8,
    )
    s = jax.jit(learner_s.init)(jax.random.PRNGKey(0))
    s, _ = learner_s.update_jit(s)
    assert np.asarray(s.family_counts).sum() == 0


def test_adaptive_training_on_mesh():
    """The adaptive path composes with shard_update on the 8-device mesh:
    family counts psum to identical replicated values on every shard."""
    from drone2d_tpu.parallel.mesh import make_mesh, shard_init, shard_update

    cfg = EnvConfig(**SMALL, adaptive_rehearsal=True)
    learner = PPOLearner(
        cfg, PPOConfig(n_steps=8, num_minibatches=2, n_epochs=1), num_envs=16
    )
    mesh = make_mesh()
    state = shard_init(mesh, learner, jax.random.PRNGKey(1))
    state = state._replace(
        rehearsal_probs=jax.device_put(
            jnp.asarray([0.4, 0, 0, 0, 0.4, 0, 0], jnp.float32),
            state.rehearsal_probs.sharding,
        )
    )
    upd = shard_update(mesh, learner)
    for _ in range(2):
        state, metrics = upd(state)
    counts = np.asarray(jax.device_get(state.family_counts))
    assert np.isfinite(counts).all() and counts.sum() >= 0
    assert float(np.asarray(jax.device_get(metrics["loss"]))) == pytest.approx(
        float(np.asarray(jax.device_get(metrics["loss"]))))


# -- fixed weighted mixes (stage_mix_weights + rehearsal_adapt) ---------------


def test_stage_mix_weights_shape_initial_probs():
    cfg = EnvConfig(**SMALL, adaptive_rehearsal=True, stage_mix_prob=0.25,
                    stage_mix_weights=(3.0, 1.0, 1.0, 1.0, 1.0),
                    corridor_mix_prob=0.02)
    learner = PPOLearner(cfg, PPOConfig(n_steps=8, num_minibatches=2), 4)
    probs = np.asarray(learner.initial_rehearsal_probs())
    # budget conserved, split 3:1:1:1:1 over stages; corridor untouched
    np.testing.assert_allclose(probs[:5].sum(), 0.25, rtol=1e-6)
    np.testing.assert_allclose(probs[0], 0.25 * 3 / 7, rtol=1e-6)
    np.testing.assert_allclose(probs[1:5], 0.25 / 7, rtol=1e-6)
    np.testing.assert_allclose(probs[5], 0.02, rtol=1e-6)


def test_nonuniform_weights_require_adaptive_path():
    cfg = EnvConfig(**SMALL, stage_mix_prob=0.25,
                    stage_mix_weights=(3.0, 1.0, 1.0, 1.0, 1.0))
    learner = PPOLearner(cfg, PPOConfig(n_steps=8, num_minibatches=2), 4)
    with pytest.raises(ValueError, match="adaptive"):
        learner.initial_rehearsal_probs()


def test_bad_weights_rejected():
    for bad in ((1.0, 1.0), (1.0, -1.0, 1.0, 1.0, 1.0), (0.0,) * 5):
        cfg = EnvConfig(**SMALL, adaptive_rehearsal=True, stage_mix_prob=0.2,
                        stage_mix_weights=bad)
        learner = PPOLearner(cfg, PPOConfig(n_steps=8, num_minibatches=2), 4)
        with pytest.raises(ValueError, match="stage_mix_weights"):
            learner.initial_rehearsal_probs()


def test_rehearsal_adapt_false_keeps_probs_fixed():
    """train_zoo with adaptive_rehearsal=True + rehearsal_adapt=False must
    leave rehearsal_probs exactly at their weighted initialization (the
    fixed-weighted-mix mode the stage_1 hunts rely on)."""
    import tempfile

    from drone2d_tpu.learn.zoo import ZooTrainer, train_zoo

    cfg = EnvConfig(**SMALL, adaptive_rehearsal=True, rehearsal_adapt=False,
                    stage_mix_prob=0.4,
                    stage_mix_weights=(4.0, 1.0, 1.0, 1.0, 1.0))
    ppo = PPOConfig(n_steps=8, num_minibatches=2, n_epochs=1)
    with tempfile.TemporaryDirectory() as d:
        state = train_zoo(cfg, ppo, 8, [0, 1], 8 * 8 * 4, d,
                          snapshots=0, log_every=1)
    got = np.asarray(state.rehearsal_probs)
    want = np.asarray(
        PPOLearner(cfg, ppo, 8).initial_rehearsal_probs()
    )
    np.testing.assert_array_equal(got, np.broadcast_to(want, got.shape))
