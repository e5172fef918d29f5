"""Actor-critic MLP, parity with SB3 `PPO("MlpPolicy", ...)`.

The reference delegates its entire model to stable-baselines3
(`drone_2d_custom_gym_env/main.py:200`); SB3's MlpPolicy defaults for a Box
action space are:

* separate policy / value MLPs, two hidden layers of 64, tanh activations
* orthogonal initialization: gain sqrt(2) on hidden layers, 0.01 on the
  action head, 1.0 on the value head; zero biases
* a state-independent diagonal-Gaussian action distribution with learnable
  log_std initialized to 0 (actions are CLIPPED to the Box bounds when sent
  to the env, not tanh-squashed)

Here that is a hand-rolled pytree of dense layers — a 27->64->64->2 network
is far below MXU tile size, so the win on TPU comes from batching thousands
of envs through one fused matmul chain, which plain jnp.dot under jit
already compiles to optimally; flax would add indirection for nothing.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


class Dense(NamedTuple):
    w: jnp.ndarray  # (in, out)
    b: jnp.ndarray  # (out,)


class ActorCriticParams(NamedTuple):
    pi: Tuple[Dense, ...]   # hidden policy trunk
    vf: Tuple[Dense, ...]   # hidden value trunk
    pi_out: Dense           # action mean head
    vf_out: Dense           # value head
    log_std: jnp.ndarray    # (act_dim,), state-independent


def _orthogonal(key: jax.Array, shape, gain: float) -> jnp.ndarray:
    return jax.nn.initializers.orthogonal(gain)(key, shape, jnp.float32)


def _dense(key: jax.Array, n_in: int, n_out: int, gain: float) -> Dense:
    return Dense(w=_orthogonal(key, (n_in, n_out), gain), b=jnp.zeros((n_out,), jnp.float32))


def init_actor_critic(
    key: jax.Array,
    obs_dim: int,
    act_dim: int,
    hidden: Sequence[int] = (64, 64),
) -> ActorCriticParams:
    n_layers = len(hidden)
    keys = jax.random.split(key, 2 * n_layers + 2)

    def trunk(ks):
        layers = []
        d = obs_dim
        for k, h in zip(ks, hidden):
            layers.append(_dense(k, d, h, math.sqrt(2.0)))
            d = h
        return tuple(layers), d

    pi, d_pi = trunk(keys[:n_layers])
    vf, d_vf = trunk(keys[n_layers : 2 * n_layers])
    return ActorCriticParams(
        pi=pi,
        vf=vf,
        pi_out=_dense(keys[-2], d_pi, act_dim, 0.01),
        vf_out=_dense(keys[-1], d_vf, 1, 1.0),
        log_std=jnp.zeros((act_dim,), jnp.float32),
    )


def _mlp(layers: Tuple[Dense, ...], x: jnp.ndarray) -> jnp.ndarray:
    for layer in layers:
        x = jnp.tanh(x @ layer.w + layer.b)
    return x


def policy_value(
    params: ActorCriticParams, obs: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (action_mean, log_std, value); obs may carry leading batch dims."""
    h_pi = _mlp(params.pi, obs)
    mean = h_pi @ params.pi_out.w + params.pi_out.b
    h_vf = _mlp(params.vf, obs)
    value = (h_vf @ params.vf_out.w + params.vf_out.b)[..., 0]
    return mean, params.log_std, value


def sample_action(
    params: ActorCriticParams, obs: jnp.ndarray, key: jax.Array
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample a ~ N(mean, exp(log_std)^2); returns (action, log_prob, value).

    log_prob is of the UNCLIPPED sample (SB3 semantics — clipping to the Box
    happens only on the copy handed to the env)."""
    mean, log_std, value = policy_value(params, obs)
    std = jnp.exp(log_std)
    noise = jax.random.normal(key, mean.shape, mean.dtype)
    action = mean + std * noise
    log_prob = jnp.sum(
        -0.5 * (noise**2 + _LOG_2PI) - log_std, axis=-1
    )
    return action, log_prob, value


def action_log_prob_entropy(
    params: ActorCriticParams, obs: jnp.ndarray, action: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(log_prob(action), entropy, value) for PPO's update pass."""
    mean, log_std, value = policy_value(params, obs)
    std = jnp.exp(log_std)
    z = (action - mean) / std
    log_prob = jnp.sum(-0.5 * (z**2 + _LOG_2PI) - log_std, axis=-1)
    entropy = jnp.sum(log_std + 0.5 * (_LOG_2PI + 1.0)) * jnp.ones(log_prob.shape)
    return log_prob, entropy, value


def params_to_flat_dict(params: ActorCriticParams) -> dict:
    """Canonical flat naming for .npz export (train.py final save)."""
    out = {"log_std": params.log_std}
    for trunk, layers in (("pi", params.pi), ("vf", params.vf)):
        for i, layer in enumerate(layers):
            out[f"{trunk}{i}/w"] = layer.w
            out[f"{trunk}{i}/b"] = layer.b
    out["pi_out/w"] = params.pi_out.w
    out["pi_out/b"] = params.pi_out.b
    out["vf_out/w"] = params.vf_out.w
    out["vf_out/b"] = params.vf_out.b
    return out


def flat_dict_to_params(flat: dict) -> ActorCriticParams:
    """Inverse of params_to_flat_dict (accepts npz mappings)."""
    import numpy as np

    def layers(trunk):
        out = []
        i = 0
        while f"{trunk}{i}/w" in flat:
            out.append(
                Dense(
                    w=jnp.asarray(np.asarray(flat[f"{trunk}{i}/w"])),
                    b=jnp.asarray(np.asarray(flat[f"{trunk}{i}/b"])),
                )
            )
            i += 1
        return tuple(out)

    return ActorCriticParams(
        pi=layers("pi"),
        vf=layers("vf"),
        pi_out=Dense(
            w=jnp.asarray(np.asarray(flat["pi_out/w"])),
            b=jnp.asarray(np.asarray(flat["pi_out/b"])),
        ),
        vf_out=Dense(
            w=jnp.asarray(np.asarray(flat["vf_out/w"])),
            b=jnp.asarray(np.asarray(flat["vf_out/b"])),
        ),
        log_std=jnp.asarray(np.asarray(flat["log_std"])),
    )


def deterministic_action(params: ActorCriticParams, obs: jnp.ndarray) -> jnp.ndarray:
    """Greedy action (SB3 `model.predict(obs, deterministic=True)`),
    clipped to the Box bounds as SB3's predict does."""
    mean, _, _ = policy_value(params, obs)
    return jnp.clip(mean, -1.0, 1.0)
