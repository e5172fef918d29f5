"""Regression guard on the shipped flagship agent artifact: it must load
through the public loader and clearly outperform a random policy."""

import os

import numpy as np
import jax
import pytest

_ART_DIR = os.path.join(os.path.dirname(__file__), "..", "artifacts")
FLAGSHIPS = [
    os.path.join(_ART_DIR, name, "new_agent.npz")
    for name in ("agent_s24", "agent_s45", "agent_s55", "agent_s103",
                 "agent_s102", "agent_s115", "agent_s125", "agent_s309")
]

pytestmark = pytest.mark.skipif(
    not all(os.path.exists(p) for p in FLAGSHIPS),
    reason="flagship artifacts not present",
)


def test_flagships_load_and_fly_corridor():
    """All shipped 64x64 flagships, evaluated as ONE stacked device program
    (run_episodes_multi) against a single random-policy baseline — the
    per-agent assertions of the old parametrized version at ~1/8 the cost."""
    import jax.numpy as jnp

    from drone2d_tpu.eval.episode import run_episodes, run_episodes_multi
    from drone2d_tpu.eval.run import load_params, scenario_config

    cfg = scenario_config("corridor").replace(path_table_n=256)
    stack = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[load_params(os.path.abspath(p)) for p in FLAGSHIPS],
    )
    agents = run_episodes_multi(cfg, stack, jax.random.PRNGKey(0), 16)
    rand = run_episodes(cfg, None, jax.random.PRNGKey(0), 16)
    assert rand.success.mean() <= 0.2
    for i, path in enumerate(FLAGSHIPS):
        # every shipped agent succeeds most of the time; random never does
        assert agents.success[i].mean() >= 0.5, (path, agents.success[i].mean())
        assert agents.total_reward[i].mean() > rand.total_reward.mean() + 500, path
        assert np.all(np.isfinite(agents.ape[i])), path


def test_shipped_pair_covers_all_published_metrics():
    """VERDICT r2 headline: the shipped pair (agent_s103, agent_s102 —
    flagship recipe + stage_mix_prob=0.25 rehearsal) must together
    match-or-beat the reference's published success rate on ALL 12
    benchmarks (barplots.py:6-29).  Asserted from the committed 100-episode
    campaign summaries, so any artifact regression fails fast."""
    import json

    from drone2d_tpu.eval.barplots import PUBLISHED_SR

    published = {k: 100.0 * v for k, v in PUBLISHED_SR.items()}
    best = {k: 0.0 for k in published}
    for name in ("agent_s103", "agent_s102"):
        path = os.path.join(_ART_DIR, name, "summary.json")
        assert os.path.exists(path), path
        with open(path) as f:
            for row in json.load(f)["scenarios"]:
                s = row["scenario"]
                best[s] = max(best[s], 100.0 * row["success_rate"])
    for scen, target in published.items():
        assert best[scen] >= target, (scen, best[scen], target)


def test_single_agent_s125_covers_all_published_metrics():
    """agent_s125 (seed 125, 3rd-quarter checkpoint) is the first SINGLE
    agent to match-or-beat every published success rate (barplots.py:6-29),
    under both the primary (seed 0) and robustness (seed 777) eval RNGs.
    Asserted from the committed 100-episode campaign summaries."""
    import json

    from drone2d_tpu.eval.barplots import PUBLISHED_SR

    published = {k: 100.0 * v for k, v in PUBLISHED_SR.items()}
    for fname in ("summary.json", "campaign_seed777_summary.json"):
        path = os.path.join(_ART_DIR, "agent_s125", fname)
        assert os.path.exists(path), path
        with open(path) as f:
            rates = {
                row["scenario"]: 100.0 * row["success_rate"]
                for row in json.load(f)["scenarios"]
            }
        for scen, target in published.items():
            assert rates[scen] >= target, (fname, scen, rates[scen], target)


def test_flagship_s309_mean_sr():
    """agent_s309 (timeperm-trained, hunt 4; the r2 highest-mean 64x64
    flagship, since superseded by s922 and s223): mean SR >= 0.80 over the
    12-scenario suite under both committed eval RNGs (measured 0.835/0.836)."""
    import json

    for fname in ("summary.json", "campaign_seed777_summary.json"):
        path = os.path.join(_ART_DIR, "agent_s309", fname)
        assert os.path.exists(path), path
        with open(path) as f:
            rows = json.load(f)["scenarios"]
        assert len(rows) == 12
        mean_sr = sum(r["success_rate"] for r in rows) / len(rows)
        assert mean_sr >= 0.80, (fname, mean_sr)


def test_flagship_s147_covers_all_published_under_both_rngs():
    """agent_s147 (hunt 10: hidden 128x128 capacity on the flagship
    stage-rehearsal recipe) is the first agent to match-or-beat every
    published success rate UNDER BOTH committed eval RNGs with mean
    SR >= 0.835 under both (measured 0.841 seed 0 / 0.838 seed 777; a
    third RNG scores 0.834 within one episode per scenario).  Asserted
    from the committed 100-episode campaign summaries."""
    import json

    from drone2d_tpu.eval.barplots import PUBLISHED_SR

    for fname in ("summary.json", "campaign_seed777_summary.json"):
        path = os.path.join(_ART_DIR, "agent_s147", fname)
        assert os.path.exists(path), path
        with open(path) as f:
            payload = json.load(f)
        rates = {r["scenario"]: r["success_rate"] for r in payload["scenarios"]}
        for scen, target in PUBLISHED_SR.items():
            assert rates[scen] >= target, (fname, scen, rates[scen], target)
        mean_sr = sum(rates.values()) / len(rates)
        assert mean_sr >= 0.835, (fname, mean_sr)


def test_flagship_s147_loads_and_flies():
    """The shipped 128x128 artifact loads through the public loader (shape
    discovery from the npz) and clearly outperforms random."""
    from drone2d_tpu.eval.episode import run_episodes
    from drone2d_tpu.eval.run import load_params, scenario_config

    path = os.path.join(_ART_DIR, "agent_s147", "new_agent.npz")
    if not os.path.exists(path):
        pytest.skip("agent_s147 artifact not present")
    params = load_params(os.path.abspath(path))
    assert params.pi[0].w.shape == (27, 128)
    cfg = scenario_config("corridor").replace(path_table_n=256)
    agent = run_episodes(cfg, params, jax.random.PRNGKey(0), 16)
    assert agent.success.mean() >= 0.6, agent.success.mean()


def test_flagship_s223_highest_mean():
    """agent_s223 (hunt 12, 128x128 capacity recipe; highest-mean until
    hunt 13's s250): mean SR >= 0.84 over the 12-scenario suite under both
    committed eval RNGs (measured 0.857 in-selection / 0.851 held-out)."""
    import json

    for fname in ("summary.json", "campaign_seed777_summary.json"):
        path = os.path.join(_ART_DIR, "agent_s223", fname)
        assert os.path.exists(path), path
        with open(path) as f:
            rows = json.load(f)["scenarios"]
        assert len(rows) == 12
        mean_sr = sum(r["success_rate"] for r in rows) / len(rows)
        assert mean_sr >= 0.84, (fname, mean_sr)


def test_flagship_s250_highest_mean():
    """agent_s250 (hunt 13, 128x128 capacity recipe) is the highest-mean
    flagship: mean SR >= 0.86 over the 12-scenario suite under both
    committed eval RNGs (measured 0.870 in-selection / 0.876 held-out;
    stage_1 0.99 the only published-rate miss under either)."""
    import json

    for fname in ("summary.json", "campaign_seed777_summary.json"):
        path = os.path.join(_ART_DIR, "agent_s250", fname)
        assert os.path.exists(path), path
        with open(path) as f:
            rows = json.load(f)["scenarios"]
        assert len(rows) == 12
        mean_sr = sum(r["success_rate"] for r in rows) / len(rows)
        assert mean_sr >= 0.86, (fname, mean_sr)


def test_flagship_s5004_strict_dominance():
    """agent_s5004 (hunt 5: PP_rew_max=8 pace fine-tune from agent_s147 —
    the round-4 saturation analysis in RESULTS.md) is the first
    STRICT-DOMINANCE flagship: every one of the 12 published success rates
    matched-or-beaten at n=1000 under a fresh RNG (seed 559, never used in
    selection), including the published stage_1 = 1.00 covered EXACTLY
    (1000/1000).  Also holds at n=100 under both committed eval RNGs.
    Asserted from the committed campaign summaries."""
    import json

    from drone2d_tpu.eval.barplots import PUBLISHED_SR

    for fname, min_mean in (
        ("summary.json", 0.84),
        ("campaign_seed777_summary.json", 0.83),
        ("campaign_n1000_summary.json", 0.845),
    ):
        path = os.path.join(_ART_DIR, "agent_s5004", fname)
        assert os.path.exists(path), path
        with open(path) as f:
            payload = json.load(f)
        rates = {r["scenario"]: r["success_rate"] for r in payload["scenarios"]}
        assert len(rates) == 12
        for scen, target in PUBLISHED_SR.items():
            assert rates[scen] >= target, (fname, scen, rates[scen], target)
        assert rates["stage_1"] == 1.0, (fname, rates["stage_1"])
        mean_sr = sum(rates.values()) / len(rates)
        assert mean_sr >= min_mean, (fname, mean_sr)
    with open(os.path.join(_ART_DIR, "agent_s5004",
                           "campaign_n1000_summary.json")) as f:
        n1000 = json.load(f)
    assert all(r["episodes"] >= 1000 for r in n1000["scenarios"])


def test_flagship_s5004_loads_and_flies_fast():
    """The strict-dominance artifact loads through the public loader and
    keeps the pace property that won it: stage_1 mean flight time well
    under the pre-pace agents' ~920 steps."""
    import numpy as np

    from drone2d_tpu.eval.episode import run_episodes
    from drone2d_tpu.eval.run import load_params, scenario_config

    path = os.path.join(_ART_DIR, "agent_s5004", "new_agent.npz")
    if not os.path.exists(path):
        pytest.skip("agent_s5004 artifact not present")
    params = load_params(os.path.abspath(path))
    assert params.pi[0].w.shape == (27, 128)
    cfg = scenario_config("stage_1").replace(path_table_n=256)
    r = run_episodes(cfg, params, jax.random.PRNGKey(3), 16)
    assert r.success.mean() >= 0.9, r.success.mean()
    assert float(np.mean(r.time_steps)) <= 800.0, np.mean(r.time_steps)


def test_flagship_s6006_strict_dominance_and_mean_crown():
    """agent_s6006 (hunt 6: PP_rew_max=8 pace fine-tune from agent_s250) is
    BOTH strictly dominant — every published success rate matched-or-beaten
    at n=1000 under a fresh never-selected RNG, stage_1 1000/1000 — AND the
    highest-mean agent measured in this project (n=1000 true mean 0.8765 >
    s250's 0.8724).  Asserted from the committed campaign summaries."""
    import json

    from drone2d_tpu.eval.barplots import PUBLISHED_SR

    for fname, min_mean in (
        ("summary.json", 0.86),
        ("campaign_seed777_summary.json", 0.86),
        ("campaign_n1000_summary.json", 0.87),
    ):
        path = os.path.join(_ART_DIR, "agent_s6006", fname)
        assert os.path.exists(path), path
        with open(path) as f:
            payload = json.load(f)
        rates = {r["scenario"]: r["success_rate"] for r in payload["scenarios"]}
        assert len(rates) == 12
        for scen, target in PUBLISHED_SR.items():
            assert rates[scen] >= target, (fname, scen, rates[scen], target)
        assert rates["stage_1"] == 1.0, (fname, rates["stage_1"])
        mean_sr = sum(rates.values()) / len(rates)
        assert mean_sr >= min_mean, (fname, mean_sr)


def test_flagship_s8004_final_round4_crown():
    """agent_s8004 (gen-2 iterated pace fine-tune, s250 -> s6006 -> s8004)
    is the final round-4 flagship: strictly dominant over every published
    success rate at n=1000 under a fresh never-selected RNG with stage_1
    1000/1000, at the highest true mean measured (0.8822; the gen-3
    iteration plateaus below it).  Asserted from committed summaries."""
    import json

    from drone2d_tpu.eval.barplots import PUBLISHED_SR

    for fname, min_mean in (
        ("summary.json", 0.86),
        ("campaign_seed777_summary.json", 0.86),
        ("campaign_n1000_summary.json", 0.875),
    ):
        path = os.path.join(_ART_DIR, "agent_s8004", fname)
        assert os.path.exists(path), path
        with open(path) as f:
            payload = json.load(f)
        rates = {r["scenario"]: r["success_rate"] for r in payload["scenarios"]}
        assert len(rates) == 12
        for scen, target in PUBLISHED_SR.items():
            assert rates[scen] >= target, (fname, scen, rates[scen], target)
        assert rates["stage_1"] == 1.0, (fname, rates["stage_1"])
        mean_sr = sum(rates.values()) / len(rates)
        assert mean_sr >= min_mean, (fname, mean_sr)
