"""Executed conformance, part 1: the reference's own trained agents.

The published SB3 checkpoints (`ppo_agents/*.zip`) are ground-truth artifacts
of the reference environment: a policy is a fingerprint of the env it was
trained in.  These tests transplant them through `compat.sb3_import` and
check (a) the forward pass is preserved exactly and (b) a transplanted agent
actually flies in the rebuilt env at its committed skill level.

The full 100-episode x 12-scenario x 2-eval-seed campaign comparison lives in
`scripts/conformance_campaign.py` (committed report:
artifacts/conformance/report.json — 23/23 scenario campaigns across agents
17/21/19 agree with the reference's committed results at |z| <= 3, plus
agent_20's 12-scenario behavioral fingerprint recorded; every published
agent the reference shipped >=100-episode numbers for is reproduced).
"""

import os

import numpy as np
import pytest

REF = "/root/reference"
ZIP_17 = f"{REF}/ppo_agents/PFCA_see_3_obs_17_90.zip"

pytestmark = pytest.mark.skipif(
    not os.path.exists(ZIP_17), reason="reference checkpoints not present"
)


@pytest.fixture(scope="module")
def sd17():
    from drone2d_tpu.compat.sb3_import import load_sb3_state_dict

    return load_sb3_state_dict(ZIP_17)


def test_forward_parity_with_torch_weights(sd17):
    """JAX params produced by the importer compute the same (mean, value) the
    torch state dict defines, to float32 matmul-reordering precision."""
    from drone2d_tpu.compat.sb3_import import params_from_state_dict, torch_policy_value
    from drone2d_tpu.models.policy import policy_value

    params = params_from_state_dict(sd17)
    obs = np.random.default_rng(0).standard_normal((512, 27)).astype(np.float32)
    mean_ref, value_ref = torch_policy_value(sd17, obs)
    mean_jax, log_std, value_jax = policy_value(params, obs)
    np.testing.assert_allclose(np.asarray(mean_jax), mean_ref, atol=1e-5)
    v_scale = max(float(np.max(np.abs(value_ref))), 1.0)
    assert float(np.max(np.abs(np.asarray(value_jax) - value_ref))) / v_scale < 1e-5
    np.testing.assert_array_equal(np.asarray(log_std), sd17["log_std"])


def test_state_dict_layout(sd17):
    """The published MlpPolicy layout is exactly ActorCriticParams' shape."""
    from drone2d_tpu.compat.sb3_import import params_from_state_dict

    p = params_from_state_dict(sd17)
    assert [tuple(l.w.shape) for l in p.pi] == [(27, 64), (64, 64)]
    assert [tuple(l.w.shape) for l in p.vf] == [(27, 64), (64, 64)]
    assert tuple(p.pi_out.w.shape) == (64, 2)
    assert tuple(p.vf_out.w.shape) == (64, 1)
    assert tuple(p.log_std.shape) == (2,)


def test_npz_roundtrip(tmp_path, sd17):
    """Imported params survive the train-CLI .npz save/load unchanged."""
    from drone2d_tpu.compat.sb3_import import params_from_state_dict
    from drone2d_tpu.models.policy import flat_dict_to_params, params_to_flat_dict

    params = params_from_state_dict(sd17)
    path = tmp_path / "agent.npz"
    np.savez(path, **{k: np.asarray(v) for k, v in params_to_flat_dict(params).items()})
    with np.load(path) as z:
        back = flat_dict_to_params(dict(z))
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_transplanted_agent_flies_at_committed_skill(sd17):
    """agent 17_90's committed corridor campaign is SR 0.95
    (best_models_config_and_res/run17see3/res/corridor/results.txt); in the
    rebuilt env the transplant must fly far above random — the strongest
    cheap executable check that obs/dynamics/reward semantics match the env
    it was trained in."""
    import jax

    from drone2d_tpu.compat.sb3_import import params_from_state_dict
    from drone2d_tpu.eval.episode import run_episodes
    from drone2d_tpu.eval.run import scenario_config

    params = params_from_state_dict(sd17)
    cfg = scenario_config("corridor").replace(path_table_n=256)
    agent = run_episodes(cfg, params, jax.random.PRNGKey(0), 16)
    rand = run_episodes(cfg, None, jax.random.PRNGKey(0), 16)
    assert agent.success.mean() >= 0.6, agent.success.mean()
    assert rand.success.mean() <= 0.2
    assert agent.total_reward.mean() > rand.total_reward.mean() + 500
