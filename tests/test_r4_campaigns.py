"""Regression locks on the committed round-4 campaign evidence.

The round-4 quality ledger (docs/RESULTS.md) claims every n=1000 finalist
across hunts 5/6/7/8/9/11 passes strict dominance over the published success
rates with stage_1 1000/1000, and that the three shipped pace flagships
score 10,000/10,000 on a fresh-RNG deep assay.  These tests assert those
claims from the committed artifacts so any artifact regression or doc
drift fails fast."""

import glob
import json
import os

from drone2d_tpu.eval.barplots import PUBLISHED_SR

_R4 = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "campaigns", "r4")


def test_all_n1000_finalists_strictly_dominate():
    files = sorted(glob.glob(os.path.join(_R4, "h*_finalists_n1000.json")))
    assert len(files) == 6, files  # hunts 5, 6, 7, 8, 9, 11
    n_finalists = 0
    for path in files:
        with open(path) as f:
            rep = json.load(f)
        for agent, rows in rep["agents"].items():
            assert len(rows) == 12, (path, agent)
            for scen, r in rows.items():
                assert r["episodes"] >= 1000, (path, agent, scen)
                assert r["success_rate"] >= PUBLISHED_SR[scen], (
                    path, agent, scen, r["success_rate"])
            s1 = rows["stage_1"]
            assert s1["successes"] == s1["episodes"], (path, agent, s1)
            n_finalists += 1
    assert n_finalists == 18, n_finalists


def test_flagships_deep_stage1_assay_perfect():
    with open(os.path.join(_R4, "stage1_n10000_flagships.json")) as f:
        rep = json.load(f)
    assert len(rep["agents"]) == 3
    for agent, rows in rep["agents"].items():
        r = rows["stage_1"]
        assert r["episodes"] >= 10000, (agent, r)
        assert r["successes"] == r["episodes"], (agent, r)
