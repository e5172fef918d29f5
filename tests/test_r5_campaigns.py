"""Regression locks on the committed round-5 campaign evidence.

Round 5 closed the AAPE axis (VERDICT r4 #1): the survivorship analysis
measured WHY the published AAPE is composition-dominated on the scenarios
where reference agents mostly die, and the dose-response waves produced
dual-table agents — strict SR dominance AND at-or-below the published
"Reactive" AAPE on all 12 scenarios at n=1000.  These tests assert those
claims from the committed artifacts so artifact regressions or doc drift
fail fast (same pattern as tests/test_r4_campaigns.py)."""

import json
import os

import pytest

from drone2d_tpu.eval.barplots import PUBLISHED_AAPE, PUBLISHED_SR

_R5 = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "campaigns", "r5")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_R5), reason="r5 campaign artifacts not present"
)

# The three n=1000 DUAL verdicts under fresh RNG 573 (docs/RESULTS.md wave 5).
DUAL_WINNERS = [
    "results/r5_pp10pa10band150/seed_22307/ckpt_9043968.npz",
    "results/r5_pa10band150b/seed_22000/ckpt_6029312.npz",
    "results/r5_pa10gen2/seed_22103/ckpt_3014656.npz",
]


def _load(name):
    with open(os.path.join(_R5, name)) as f:
        return json.load(f)


def test_dual_table_winners_at_n1000():
    """Each DUAL winner: all 12 success rates >= published AND all 12 AAPEs
    <= published AND stage_1 1000/1000, at n=1000 under RNG 573."""
    rep = _load("dual_table_n1000_w5.json")
    assert rep["seed"] == 573
    for agent in DUAL_WINNERS:
        rows = rep["agents"][agent]
        assert len(rows) == 12
        for scen, r in rows.items():
            assert r["episodes"] >= 1000, (agent, scen)
            assert r["success_rate"] >= PUBLISHED_SR[scen], (
                agent, scen, r["success_rate"])
            assert r["avg_ape"] <= PUBLISHED_AAPE[scen], (
                agent, scen, r["avg_ape"])
        s1 = rows["stage_1"]
        assert s1["successes"] == s1["episodes"], (agent, s1)


def test_s8004_control_holds_strict_sr():
    """The round-4 flagship stays strictly SR-dominant in every round-5
    campaign it appears in (it is the mean-SR Pareto point shipped
    alongside the dual-table agents)."""
    for name in ("dual_table_n1000.json", "dual_table_n1000_w5.json"):
        rows = _load(name)["agents"]["artifacts/agent_s8004/new_agent.npz"]
        for scen, r in rows.items():
            assert r["success_rate"] >= PUBLISHED_SR[scen], (name, scen)
        assert rows["stage_1"]["successes"] == rows["stage_1"]["episodes"]


def test_survivorship_analysis_key_findings():
    """The measured survivorship decomposition (VERDICT r4 #1a): on
    perpendicular the reference agents' SUCCESS-episode APE is far worse
    than the flagship's on identical paired episodes, and the flagship's
    all-episode stage_4 AAPE undercuts every reference agent's
    success-only AAPE."""
    rep = _load("aape_survivorship.json")
    assert rep["focal"] == "agent_s8004"
    perp = rep["scenarios"]["perpendicular"]["agents"]
    focal_succ = perp["agent_s8004"]["aape_success"]
    for ref in ("agent_17_90", "agent_19_90", "agent_20_90", "agent_21_90"):
        # ref agents die early and cheap; their survivals log huge APEs
        assert perp[ref]["aape_success"] > 200
        assert perp[ref]["aape_success"] > focal_succ + 50
        assert perp[ref]["aape_fail"] < perp[ref]["aape_success"]
    st4 = rep["scenarios"]["stage_4"]["agents"]
    for ref in ("agent_17_90", "agent_19_90", "agent_20_90", "agent_21_90"):
        assert st4["agent_s8004"]["aape_all"] < st4[ref]["aape_success"]
    # paired-episode design: every agent flew the same 1000 episodes
    assert rep["episodes"] >= 1000


def test_pooled_n10000_verdicts():
    """The 120,000-episode pooled campaign (fresh RNG 574): s8004's mean is
    pinned at ~0.880 with stage_1 10,000/10,000 (VERDICT r4 #8), and the
    shipped dual-table flagship seed_22307 holds BOTH published tables at
    n=10,000 — every SR >= published, every AAPE <= published, stage_1
    10,000/10,000."""
    rep = _load("pooled_n10000.json")
    assert rep["episodes"] >= 10000

    s8004 = rep["agents"]["artifacts/agent_s8004/new_agent.npz"]
    mean = sum(r["success_rate"] for r in s8004.values()) / 12
    assert 0.87 <= mean <= 0.89, mean  # the ~0.88 plateau, now +-0.003
    assert s8004["stage_1"]["successes"] == s8004["stage_1"]["episodes"]
    for scen, r in s8004.items():
        assert r["success_rate"] >= PUBLISHED_SR[scen], scen

    dual = rep["agents"][
        "results/r5_pp10pa10band150/seed_22307/ckpt_9043968.npz"]
    for scen, r in dual.items():
        assert r["episodes"] >= 10000, scen
        assert r["success_rate"] >= PUBLISHED_SR[scen], (scen, r)
        assert r["avg_ape"] <= PUBLISHED_AAPE[scen], (scen, r)
    assert dual["stage_1"]["successes"] == dual["stage_1"]["episodes"]


def test_dual_flagship_n10000_replication():
    """The independent second n=10,000 campaign (RNG 576) reproduces the
    dual verdict: both tables held, stage_1 10,000/10,000 again (20,000
    pooled with the first campaign), mean within 0.001 of the first."""
    rep = _load("s22307_n10000_replicate.json")
    rows = rep["agents"]["artifacts/agent_s22307/new_agent.npz"]
    for scen, r in rows.items():
        assert r["episodes"] >= 10000, scen
        assert r["success_rate"] >= PUBLISHED_SR[scen], (scen, r)
        assert r["avg_ape"] <= PUBLISHED_AAPE[scen], (scen, r)
    assert rows["stage_1"]["successes"] == rows["stage_1"]["episodes"]
    mean = sum(r["success_rate"] for r in rows.values()) / 12
    assert abs(mean - 0.8317) < 0.01, mean


def test_shipped_dual_flagship_artifact():
    """artifacts/agent_s22307 is the packaged dual-table flagship: params
    load through the public loader at the documented capacity, and its
    committed both-RNG campaign summaries show 12/12 published-SR coverage."""
    art = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "agent_s22307")
    if not os.path.isdir(art):
        pytest.skip("agent_s22307 not packaged")
    from drone2d_tpu.eval.run import load_params

    params = load_params(os.path.join(art, "new_agent.npz"))
    assert [l.w.shape[1] for l in params.pi] == [128, 128]
    for fname in ("summary.json", "campaign_seed777_summary.json"):
        with open(os.path.join(art, fname)) as f:
            doc = json.load(f)
        assert doc["published_coverage"] == 12, fname
        assert doc["mean_success_rate"] >= 0.80, fname


def test_preset_dogfood_finalists_strict():
    """The README quick-start chain (sweep --preset flagship-scratch on 24
    fresh seeds -> both-RNG selection -> n=1000 verification at the README's
    example seed 567) produced finalists that pass strict dominance —
    the preset reproduces hunt 7 as documented."""
    rep = _load("preset_dogfood_n1000.json")
    assert rep["seed"] == 567
    assert len(rep["agents"]) >= 2
    for agent, rows in rep["agents"].items():
        for scen, r in rows.items():
            assert r["episodes"] >= 1000
            assert r["success_rate"] >= PUBLISHED_SR[scen], (agent, scen)
        assert rows["stage_1"]["successes"] == rows["stage_1"]["episodes"]


def test_dose_response_selection_tables_committed():
    """Every arm cited in the RESULTS dose-response tables has both-RNG
    selection tables committed."""
    arms = ["pa4", "band150", "pa4band150", "pa75band150", "pp5", "pp35",
            "pa75band150b", "pa10band150", "pp5pa75band150", "pa75gen2",
            "pa10band150b", "pa10gen2", "pa12band150", "pp10pa10band150",
            "pp12pa10band150", "pa75gen2lite", "pp10pa10b", "pp10gen2"]
    for arm in arms:
        for f in ("select", "select777"):
            path = os.path.join(_R5, f"r5_{arm}_{f}.json")
            assert os.path.exists(path), path
            table = json.load(open(path))
            assert len(table) >= 8  # candidates x scenarios populated
