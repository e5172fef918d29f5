"""Parity of the fused pallas policy kernel (interpret mode on CPU) vs the
production models/policy.sample_action path."""

import jax
import jax.numpy as jnp
import numpy as np

from drone2d_tpu.models.policy import init_actor_critic, policy_value, sample_action
from drone2d_tpu.ops.pallas_policy import fused_sample_action


def test_fused_sample_matches_reference():
    key = jax.random.PRNGKey(0)
    params = init_actor_critic(key, 27, 2, hidden=(128, 128))
    # non-zero log_std exercises the exp/affine path
    params = params._replace(log_std=jnp.array([-0.3, 0.2], jnp.float32))
    obs = jax.random.normal(jax.random.fold_in(key, 1), (512, 27), jnp.float32)
    noise = jax.random.normal(jax.random.fold_in(key, 2), (512, 2), jnp.float32)

    act_f, logp_f, val_f = fused_sample_action(
        params, obs, noise, block=256, interpret=True)

    mean, log_std, value = policy_value(params, obs)
    act_r = mean + jnp.exp(log_std) * noise
    logp_r = jnp.sum(
        -0.5 * (noise**2 + np.log(2 * np.pi)) - log_std, axis=-1)

    np.testing.assert_allclose(act_f, act_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(logp_f, logp_r, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(val_f, value, rtol=1e-5, atol=1e-5)


def test_fused_sample_consistent_with_sample_action_rng():
    """Same RNG key through sample_action and the fused path (noise drawn
    identically outside) gives the same actions."""
    key = jax.random.PRNGKey(7)
    params = init_actor_critic(key, 27, 2, hidden=(128, 128))
    obs = jax.random.normal(jax.random.fold_in(key, 3), (256, 27), jnp.float32)
    akey = jax.random.fold_in(key, 4)
    a_ref, logp_ref, v_ref = sample_action(params, obs, akey)
    noise = jax.random.normal(akey, (256, 2), jnp.float32)
    a_f, logp_f, v_f = fused_sample_action(
        params, obs, noise, block=256, interpret=True)
    np.testing.assert_allclose(a_f, a_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(logp_f, logp_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(v_f, v_ref, rtol=1e-5, atol=1e-5)
