"""Regression guard on the shipped flagship agent artifact: it must load
through the public loader and clearly outperform a random policy."""

import os

import numpy as np
import jax
import pytest

_ART_DIR = os.path.join(os.path.dirname(__file__), "..", "artifacts")
FLAGSHIPS = [
    os.path.join(_ART_DIR, name, "new_agent.npz")
    for name in ("agent_s24", "agent_s45", "agent_s55")
]

pytestmark = pytest.mark.skipif(
    not all(os.path.exists(p) for p in FLAGSHIPS),
    reason="flagship artifacts not present",
)


@pytest.mark.parametrize("artifact", FLAGSHIPS, ids=["s24", "s45", "s55"])
def test_flagship_loads_and_flies_corridor(artifact):
    from drone2d_tpu.eval.episode import run_episodes
    from drone2d_tpu.eval.run import load_params, scenario_config

    params = load_params(os.path.abspath(artifact))
    cfg = scenario_config("corridor").replace(path_table_n=256)
    agent = run_episodes(cfg, params, jax.random.PRNGKey(0), 16)
    rand = run_episodes(cfg, None, jax.random.PRNGKey(0), 16)
    # the shipped agent succeeds most of the time; random never does
    assert agent.success.mean() >= 0.5, agent.success.mean()
    assert rand.success.mean() <= 0.2
    assert agent.total_reward.mean() > rand.total_reward.mean() + 500
    assert np.all(np.isfinite(agent.ape))
