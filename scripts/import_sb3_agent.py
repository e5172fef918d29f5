"""Import a reference SB3 PPO checkpoint (.zip) to a train-CLI .npz.

    python scripts/import_sb3_agent.py \
        /root/reference/ppo_agents/PFCA_see_3_obs_19_90.zip \
        --out artifacts/imported/agent_19_90.npz [--verify]

The .npz is the same flat format `drone2d_tpu.train` saves, so the imported
agent plugs straight into `eval.run --agent`, `debug --agent`, and
`train --init-params`.  `--verify` cross-checks the JAX forward pass against
a torch-free numpy evaluation of the original state dict on random
observations before writing.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("zip_path", help="SB3 PPO checkpoint zip (ppo_agents/*.zip)")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--verify", action="store_true",
                   help="cross-check JAX vs torch-defined forward pass")
    args = p.parse_args(argv)

    # importer is pure host-side numpy/torch; keep JAX off the TPU tunnel
    import jax

    jax.config.update("jax_platforms", "cpu")

    from drone2d_tpu.compat.sb3_import import (
        load_sb3_state_dict,
        params_from_state_dict,
        torch_policy_value,
    )
    from drone2d_tpu.models.policy import params_to_flat_dict, policy_value

    sd = load_sb3_state_dict(args.zip_path)
    params = params_from_state_dict(sd)

    if args.verify:
        rng = np.random.default_rng(0)
        obs = rng.standard_normal((256, params.pi[0].w.shape[0])).astype(np.float32)
        mean_ref, value_ref = torch_policy_value(sd, obs)
        mean_jax, _, value_jax = policy_value(params, obs)
        err_m = float(np.max(np.abs(np.asarray(mean_jax) - mean_ref)))
        # value head output is O(10-100); compare relative to its scale
        # (float32 matmul accumulation order differs between XLA and numpy)
        v_scale = max(float(np.max(np.abs(value_ref))), 1.0)
        err_v = float(np.max(np.abs(np.asarray(value_jax) - value_ref))) / v_scale
        print(f"verify: max|mean diff| {err_m:.3e}  max rel|value diff| {err_v:.3e}")
        assert err_m < 1e-5 and err_v < 1e-5, "transplant mismatch"

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **{k: np.asarray(v) for k, v in params_to_flat_dict(params).items()})
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
