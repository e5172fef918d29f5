"""PPO learner tests: GAE math, loss semantics, end-to-end update, and the
model's SB3-parity properties (SURVEY.md §4: unit layer the reference lacks)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from drone2d_tpu.config import EnvConfig, PPOConfig
from drone2d_tpu.learn.gae import compute_gae
from drone2d_tpu.learn.ppo import PPOLearner
from drone2d_tpu.models.policy import (
    action_log_prob_entropy,
    deterministic_action,
    init_actor_critic,
    policy_value,
    sample_action,
)

SMALL_ENV = dict(path_table_n=128, golden_iters=8)


# ---------------------------------------------------------------------------
# GAE vs a straightforward numpy reference (SB3 buffers.py semantics)
# ---------------------------------------------------------------------------


def _gae_numpy(rewards, values, dones, last_values, gamma, lam):
    T, N = rewards.shape
    adv = np.zeros((T, N), np.float64)
    gae = np.zeros(N, np.float64)
    next_value = last_values.astype(np.float64)
    for t in reversed(range(T)):
        nd = 1.0 - dones[t]
        delta = rewards[t] + gamma * next_value * nd - values[t]
        gae = delta + gamma * lam * nd * gae
        adv[t] = gae
        next_value = values[t]
    return adv, adv + values


def test_gae_matches_numpy_reference():
    rng = np.random.default_rng(0)
    T, N = 17, 5
    rewards = rng.normal(size=(T, N)).astype(np.float32)
    values = rng.normal(size=(T, N)).astype(np.float32)
    dones = (rng.random((T, N)) < 0.15).astype(np.float32)
    last_values = rng.normal(size=N).astype(np.float32)

    adv, ret = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(last_values), gamma=0.99, gae_lambda=0.95,
    )
    adv_np, ret_np = _gae_numpy(rewards, values, dones, last_values, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(adv), adv_np, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ret), ret_np, rtol=1e-4, atol=1e-4)


def test_gae_done_blocks_bootstrap():
    # a done at t kills the value bootstrap: advantage = r - V exactly
    rewards = jnp.ones((1, 1))
    values = jnp.full((1, 1), 0.3)
    dones = jnp.ones((1, 1))
    last_values = jnp.full((1,), 99.0)  # must NOT leak through the done
    adv, _ = compute_gae(rewards, values, dones, last_values, gamma=0.99, gae_lambda=0.95)
    np.testing.assert_allclose(float(adv[0, 0]), 1.0 - 0.3, rtol=1e-6)


# ---------------------------------------------------------------------------
# Model: SB3 MlpPolicy parity properties
# ---------------------------------------------------------------------------


def test_policy_shapes_and_init():
    params = init_actor_critic(jax.random.PRNGKey(0), 27, 2)
    mean, log_std, value = policy_value(params, jnp.zeros((4, 27)))
    assert mean.shape == (4, 2) and value.shape == (4,)
    # log_std starts at 0 => std 1 (SB3 log_std_init=0)
    np.testing.assert_allclose(np.asarray(log_std), 0.0)
    # orthogonal hidden layers: for (27, 64) the 27 rows are orthonormal*gain
    w = np.asarray(params.pi[0].w)
    gram = w @ w.T
    np.testing.assert_allclose(gram, np.eye(27) * 2.0, atol=1e-4)
    # tiny action head (gain 0.01): near-zero initial means
    assert float(jnp.max(jnp.abs(mean))) < 0.1


def test_log_prob_matches_gaussian():
    params = init_actor_critic(jax.random.PRNGKey(1), 27, 2)
    obs = jax.random.normal(jax.random.PRNGKey(2), (8, 27))
    action, log_prob, value = sample_action(params, obs, jax.random.PRNGKey(3))
    lp2, ent, v2 = action_log_prob_entropy(params, obs, action)
    np.testing.assert_allclose(np.asarray(log_prob), np.asarray(lp2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(value), np.asarray(v2), rtol=1e-6)
    # diag-Gaussian entropy with std=1, D=2: D/2*(log(2*pi)+1) = log(2*pi)+1
    expect = np.log(2 * np.pi) + 1.0
    np.testing.assert_allclose(np.asarray(ent), expect, rtol=1e-5)


def test_deterministic_action_clipped():
    params = init_actor_critic(jax.random.PRNGKey(0), 27, 2)
    big = params._replace(
        pi_out=params.pi_out._replace(b=jnp.array([5.0, -5.0]))
    )
    a = deterministic_action(big, jnp.zeros((27,)))
    assert float(a[0]) == 1.0 and float(a[1]) == -1.0


# ---------------------------------------------------------------------------
# End-to-end update
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def learner():
    return PPOLearner(
        EnvConfig(**SMALL_ENV), PPOConfig(n_steps=8, num_minibatches=4, n_epochs=2),
        num_envs=8,
    )


def test_update_runs_and_learns_something(learner):
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    state2, metrics = learner.update_jit(state)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.global_step) == 8 * 8
    # params actually moved
    delta = jax.tree.reduce(
        lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, b: a - b, state.params, state2.params),
        0.0,
    )
    assert delta > 0.0
    # a second update continues from the new state without recompile surprises
    state3, metrics3 = learner.update_jit(state2)
    assert np.isfinite(float(metrics3["loss"]))
    assert int(state3.global_step) == 2 * 8 * 8


def test_rollout_shapes(learner):
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    _, batch, last_values, stats = jax.jit(learner.rollout)(state)
    assert batch.obs.shape == (8, 8, 27)
    assert batch.actions.shape == (8, 8, 2)
    assert batch.values.shape == (8, 8)
    assert last_values.shape == (8,)
    assert np.all(np.isfinite(np.asarray(batch.obs)))


def test_affine_shuffle_mode(learner):
    # affine mode: sort-free index bijection; update runs and learns on a
    # power-of-two batch, and validation rejects non-power-of-two batches.
    aff = PPOLearner(
        EnvConfig(**SMALL_ENV),
        PPOConfig(n_steps=8, num_minibatches=4, n_epochs=2, shuffle="affine"),
        num_envs=8,
    )
    state = jax.jit(aff.init)(jax.random.PRNGKey(0))
    state2, metrics = aff.update_jit(state)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.global_step) == 8 * 8

    with pytest.raises(ValueError, match="power-of-two"):
        PPOLearner(
            EnvConfig(**SMALL_ENV),
            PPOConfig(n_steps=6, num_minibatches=4, n_epochs=2, shuffle="affine"),
            num_envs=8,
        )
    with pytest.raises(ValueError, match="shuffle"):
        PPOLearner(
            EnvConfig(**SMALL_ENV),
            PPOConfig(n_steps=8, num_minibatches=4, n_epochs=2, shuffle="bogus"),
            num_envs=8,
        )


def test_timeperm_shuffle_mode(learner):
    # timeperm: gather-free epoch shuffle (permute the time axis, slice
    # contiguous minibatches).  Update runs, learns, and the step counter
    # advances identically to exact mode; validation rejects n_steps not
    # divisible by num_minibatches.
    tp = PPOLearner(
        EnvConfig(**SMALL_ENV),
        PPOConfig(n_steps=8, num_minibatches=4, n_epochs=2, shuffle="timeperm"),
        num_envs=8,
    )
    state = jax.jit(tp.init)(jax.random.PRNGKey(0))
    state2, metrics = tp.update_jit(state)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.global_step) == 8 * 8
    delta = jax.tree.reduce(
        lambda acc, leaf: acc + float(jnp.abs(leaf).sum()),
        jax.tree.map(lambda a, b: a - b, state.params, state2.params),
        0.0,
    )
    assert delta > 0.0

    with pytest.raises(ValueError, match="timeperm"):
        PPOLearner(
            EnvConfig(**SMALL_ENV),
            PPOConfig(n_steps=6, num_minibatches=4, n_epochs=2, shuffle="timeperm"),
            num_envs=8,
        )


def test_timeperm_minibatches_partition_the_batch():
    # every epoch must use each (t, env) sample exactly once: the permuted
    # time axis reshaped to (num_minibatches, mb) is a partition of range(T)
    T, NMB = 8, 4
    perm = jax.random.permutation(jax.random.PRNGKey(3), T)
    idx = np.asarray(perm).reshape(NMB, T // NMB)
    assert sorted(idx.ravel().tolist()) == list(range(T))


def test_affine_perm_is_bijection():
    # the a*i+b mod B map with odd a over power-of-two B is a permutation
    B = 1024
    a = jnp.uint32(387)  # odd
    b = jnp.uint32(555)
    perm = (a * jnp.arange(B, dtype=jnp.uint32) + b) % B
    assert len(np.unique(np.asarray(perm))) == B


def test_value_target_gradient_flows(learner):
    # loss must depend on value head (vf_coef) and policy head
    state = jax.jit(learner.init)(jax.random.PRNGKey(0))
    obs = jax.random.normal(jax.random.PRNGKey(7), (4, 27))
    actions = jnp.zeros((4, 2))
    old_lp = jnp.zeros((4,))
    adv = jnp.array([1.0, -1.0, 0.5, -0.5])
    ret = jnp.array([1.0, 2.0, 3.0, 4.0])
    grads = jax.grad(lambda p: learner.loss_fn(p, obs, actions, old_lp, adv, ret)[0])(
        state.params
    )
    assert float(jnp.sum(jnp.abs(grads.vf_out.w))) > 0
    assert float(jnp.sum(jnp.abs(grads.log_std))) > 0
