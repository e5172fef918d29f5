"""Doc-number drift guard (VERDICT r4 weak #1 / next #2).

Three rounds in a row the judge found stale numbers in README/RESULTS/
MIGRATING (conformance row counts, bench headline, test counts) after the
underlying artifacts moved on.  The fix is mechanical, not editorial: these
tests assert the prose cites what the committed artifacts actually say, so
drift fails CI instead of waiting for a reviewer.

Contracts enforced:
- every "N/N scenario campaigns agree" claim equals the number of
  `agree: true` rows in artifacts/conformance/report.json;
- every "driver-captured" bench headline cites the LATEST `BENCH_r*.json`
  at the repo root, with the value rounded to the same 0.01M it prints;
- README's "N tests:" tree annotation matches `pytest --collect-only`.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
DOCS = ["README.md", "docs/RESULTS.md", "docs/MIGRATING.md"]


def _read(rel):
    with open(os.path.join(ROOT, rel)) as f:
        return f.read()


def test_conformance_count_matches_report():
    report = json.load(
        open(os.path.join(ROOT, "artifacts/conformance/report.json"))
    )
    n_agree = sum(
        1
        for agent in report["agents"].values()
        for row in agent["rows"]
        if row.get("agree") is True
    )
    assert n_agree >= 21  # sanity: the r3 floor
    for rel in DOCS:
        for m in re.finditer(r"(\d+)/(\d+) scenario campaigns agree", _read(rel)):
            assert int(m.group(1)) == n_agree and int(m.group(2)) == n_agree, (
                f"{rel} claims {m.group(0)!r} but report.json has "
                f"{n_agree} agreeing rows"
            )


def test_bench_headline_cites_latest():
    """Every 'driver-captured' headline must cite a BENCH_r*.json that (a)
    exists, (b) contains the exact value quoted (0.01M rounding), and (c) is
    at most ONE capture behind the newest file present.  The one-behind
    grace exists because the driver writes BENCH_r{N}.json AFTER the round's
    last commit — the docs cannot cite a file that doesn't exist yet; citing
    anything older than that (the r2-r4 drift disease) still fails."""
    benches = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    assert benches, "no BENCH_r*.json at repo root"
    allowed = {os.path.basename(p) for p in benches[-2:]}
    for rel in ["README.md", "docs/RESULTS.md"]:
        text = _read(rel)
        lines = [l for l in text.splitlines() if "driver-captured" in l]
        assert lines, f"{rel}: no driver-captured bench headline found"
        for line in lines:
            m = re.search(r"BENCH_r\d+\.json", line)
            assert m, f"{rel} headline cites no BENCH file: {line[:120]}"
            cited = m.group(0)
            assert cited in allowed, (
                f"{rel} headline cites {cited} but newer captures exist "
                f"({sorted(allowed)}): {line[:120]}"
            )
            value = json.load(open(os.path.join(ROOT, cited)))["parsed"]["value"]
            headline = f"{value / 1e6:.2f}M"
            assert headline in line, (
                f"{rel} headline value drifted ({cited} says {headline}): "
                f"{line[:120]}"
            )


def test_baseline_tables_match_barplots_constants():
    """BASELINE.md's published-numbers tables and the code's mirrored
    constants (eval/barplots.py, the selection/locking single source) must
    agree row by row — a transcription error in either place would silently
    shift every coverage claim."""
    from drone2d_tpu.eval.barplots import SCENARIO_DATA, STAGES_DATA

    text = _read("BASELINE.md")
    rows = {}
    for line in text.splitlines():
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) == 9 and all(
            c.lstrip("-").isdigit() for c in cells[1:]
        ):
            rows[cells[0]] = [int(c) for c in cells[1:]]
    assert len(rows) == 12, sorted(rows)  # 7 scenarios + 5 stages
    for data, names in (
        (SCENARIO_DATA, SCENARIO_DATA["scenario"]),
        (STAGES_DATA, STAGES_DATA["stage"]),
    ):
        for i, name in enumerate(names):
            expect = [data["reactive"][m][i] for m in ("AAPE", "SR", "FR", "CR")]
            expect += [data["static"][m][i] for m in ("AAPE", "SR", "FR", "CR")]
            assert rows[name] == expect, (name, rows[name], expect)


def test_readme_test_count_matches_collection():
    m = re.search(r"(\d+)\+? tests:", _read("README.md"))
    assert m, "README no longer states a test count ('N tests:')"
    stated = int(m.group(1))
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q",
         "-p", "no:cacheprovider", "tests/"],
        cwd=ROOT, capture_output=True, text=True, timeout=600,
    )
    if proc.returncode != 0:
        pytest.skip(f"collect-only failed in this image: {proc.stderr[-400:]}")
    mm = re.search(r"(\d+) tests collected", proc.stdout)
    assert mm, f"could not parse collect-only output: {proc.stdout[-400:]}"
    collected = int(mm.group(1))
    # README states "N+ tests" — a floor, so adding tests doesn't require a
    # README edit, but losing tests (or stating more than exist) fails.
    assert stated <= collected, (
        f"README claims {stated} tests but only {collected} collect"
    )
    assert collected - stated < 60, (
        f"README's test count ({stated}) lags collection ({collected}) by "
        f"{collected - stated}; refresh the README tree annotation"
    )
