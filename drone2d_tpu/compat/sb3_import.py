"""Import a stable-baselines3 PPO checkpoint into ActorCriticParams.

The reference ships ~80 trained agents as SB3 `.zip` archives
(`/root/reference/ppo_agents/PFCA_see_3_obs_<run>_<ckpt-e5>.zip`, saved by
`main.py:209` / SB3 CheckpointCallback).  Each archive contains a
`policy.pth` torch state dict for the MlpPolicy:

    log_std                              (2,)
    mlp_extractor.policy_net.{0,2}.{weight,bias}   27->64->64 tanh trunk
    mlp_extractor.value_net.{0,2}.{weight,bias}    27->64->64 tanh trunk
    action_net.{weight,bias}             64->2 mean head
    value_net.{weight,bias}              64->1 value head

That is exactly the layout of `models.policy.ActorCriticParams` (SB3-parity
by design); torch stores Linear weights as (out, in) so each matrix is
transposed on the way in.  Loading needs only `zipfile` + `torch` — SB3
itself is not required (and is not installable in this image).

This is the bridge for *executed conformance*: a published agent transplanted
through here and evaluated with `drone2d_tpu.eval.run` against the same
scenarios must reproduce the campaign numbers committed under
`/root/reference/Tests/` and `/root/reference/best_models_config_and_res/`.
"""

from __future__ import annotations

import io
import zipfile
from typing import Dict, Tuple

import numpy as np

from drone2d_tpu.models.policy import ActorCriticParams, Dense


def load_sb3_state_dict(zip_path: str) -> Dict[str, np.ndarray]:
    """Extract `policy.pth` from an SB3 zip and return it as numpy arrays."""
    import torch

    with zipfile.ZipFile(zip_path) as z:
        buf = io.BytesIO(z.read("policy.pth"))
    sd = torch.load(buf, map_location="cpu", weights_only=True)
    return {k: v.detach().numpy().astype(np.float32) for k, v in sd.items()}


def _trunk(sd: Dict[str, np.ndarray], net: str) -> Tuple[Dense, ...]:
    """Collect the tanh trunk of `mlp_extractor.<net>` in layer order.

    SB3 builds the trunk as nn.Sequential(Linear, Tanh, Linear, Tanh, ...) so
    Linear layers sit at even indices 0, 2, 4, ...
    """
    import jax.numpy as jnp

    layers = []
    i = 0
    while f"mlp_extractor.{net}.{i}.weight" in sd:
        layers.append(
            Dense(
                w=jnp.asarray(sd[f"mlp_extractor.{net}.{i}.weight"].T),
                b=jnp.asarray(sd[f"mlp_extractor.{net}.{i}.bias"]),
            )
        )
        i += 2
    if not layers:
        raise ValueError(f"no mlp_extractor.{net} layers found in state dict")
    return tuple(layers)


def params_from_state_dict(sd: Dict[str, np.ndarray]) -> ActorCriticParams:
    import jax.numpy as jnp

    return ActorCriticParams(
        pi=_trunk(sd, "policy_net"),
        vf=_trunk(sd, "value_net"),
        pi_out=Dense(
            w=jnp.asarray(sd["action_net.weight"].T),
            b=jnp.asarray(sd["action_net.bias"]),
        ),
        vf_out=Dense(
            w=jnp.asarray(sd["value_net.weight"].T),
            b=jnp.asarray(sd["value_net.bias"]),
        ),
        log_std=jnp.asarray(sd["log_std"]),
    )


def load_sb3_agent(zip_path: str) -> ActorCriticParams:
    """SB3 PPO zip -> ActorCriticParams, ready for eval.run / train warm-start."""
    return params_from_state_dict(load_sb3_state_dict(zip_path))


def main(argv=None) -> None:
    """CLI: SB3 PPO zip -> train-CLI .npz (console script drone2d-import-sb3;
    same behavior as scripts/import_sb3_agent.py)."""
    import argparse
    import os

    p = argparse.ArgumentParser(
        description="Import a reference SB3 PPO checkpoint (.zip) to a "
        "drone2d_tpu .npz usable by eval/debug/train --init-params."
    )
    p.add_argument("zip_path")
    p.add_argument("--out", required=True)
    p.add_argument("--verify", action="store_true",
                   help="cross-check the JAX forward pass against a "
                   "torch-free numpy evaluation of the original weights")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side tool; skip the TPU

    from drone2d_tpu.models.policy import params_to_flat_dict, policy_value

    sd = load_sb3_state_dict(args.zip_path)
    params = params_from_state_dict(sd)
    if args.verify:
        rng = np.random.default_rng(0)
        obs = rng.standard_normal((256, params.pi[0].w.shape[0])).astype(np.float32)
        mean_ref, value_ref = torch_policy_value(sd, obs)
        mean_jax, _, value_jax = policy_value(params, obs)
        err_m = float(np.max(np.abs(np.asarray(mean_jax) - mean_ref)))
        v_scale = max(float(np.max(np.abs(value_ref))), 1.0)
        err_v = float(np.max(np.abs(np.asarray(value_jax) - value_ref))) / v_scale
        print(f"verify: max|mean diff| {err_m:.3e}  max rel|value diff| {err_v:.3e}")
        assert err_m < 1e-5 and err_v < 1e-5, "transplant mismatch"
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **{k: np.asarray(v)
                          for k, v in params_to_flat_dict(params).items()})
    print(f"wrote {args.out}")


def torch_policy_value(
    sd: Dict[str, np.ndarray], obs: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Reference forward pass straight off the state dict (numpy, float32).

    Used by the conformance test to check the transplanted JAX params produce
    the same (action_mean, value) as the torch weights define — independent of
    `models.policy`'s own code path.
    """

    def mlp(x, net):
        i = 0
        while f"mlp_extractor.{net}.{i}.weight" in sd:
            x = np.tanh(x @ sd[f"mlp_extractor.{net}.{i}.weight"].T
                        + sd[f"mlp_extractor.{net}.{i}.bias"])
            i += 2
        return x

    h_pi = mlp(obs, "policy_net")
    mean = h_pi @ sd["action_net.weight"].T + sd["action_net.bias"]
    h_vf = mlp(obs, "value_net")
    value = (h_vf @ sd["value_net.weight"].T + sd["value_net.bias"])[..., 0]
    return mean, value
