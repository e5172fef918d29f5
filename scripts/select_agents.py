"""Batched checkpoint/agent selection over the 12-scenario suite.

The reference picked its published agents by hand from ~80 checkpoints
(ppo_agents/, best 3 enshrined in best_models_config_and_res/).  This tool
does that selection at TPU speed: it loads EVERY candidate (each seed's
final new_agent.npz plus all intermediate orbax checkpoint steps), stacks
their params along an agent axis, and evaluates all candidates on each
scenario as ONE device program (`eval.episode.run_episodes_multi` —
vmap over agents x vmap over episodes).  48 candidates x 12 scenarios x
100 episodes is minutes, not days.

    python scripts/select.py results/r2_hunt3/seed_* [--episodes 100]
        [--seed 0] [--scenarios corridor large ...] [--finals-only]
        [--out results/r2_hunt3/select.json]

Prints a per-candidate table (success rate per scenario, mean SR, and how
many of the 12 published success rates the candidate matches-or-beats) and
writes the full summary JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Reference barplots.py:6-29 "Reactive" success rates (fractions) and AAPE
# (px) — single source shared with the artifact regression tests.
from drone2d_tpu.eval.barplots import PUBLISHED_AAPE, PUBLISHED_SR


def find_candidates(run_dirs, finals_only=False):
    """(label, agent_path, checkpoint_step) triplets for every candidate."""
    cands = []
    for d in run_dirs:
        d = os.path.normpath(d)
        name = os.path.basename(d)
        final = os.path.join(d, "new_agent.npz")
        if os.path.exists(final):
            cands.append((f"{name}/final", final, None))
        if finals_only:
            continue
        steps = sorted(
            int(e) for e in os.listdir(d)
            if e.isdigit() and os.path.isdir(os.path.join(d, e))
        )
        # the last saved step duplicates the final agent; skip it
        for s in steps[:-1]:
            cands.append((f"{name}/{s}", d, s))
        # zoo-trainer .npz snapshots (learn/zoo.py save_zoo)
        import re

        for e in sorted(os.listdir(d)):
            m = re.fullmatch(r"ckpt_(\d+)\.npz", e)
            if m:
                cands.append((f"{name}/{m.group(1)}", os.path.join(d, e), None))
    return cands


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dirs", nargs="+", help="seed run dirs (from sweep.py)")
    p.add_argument("--episodes", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scenarios", nargs="+", default=None,
                   help="subset of scenarios (default: all 12)")
    p.add_argument("--finals-only", action="store_true",
                   help="skip intermediate checkpoints")
    p.add_argument("--out", default=None, help="summary JSON path")
    args = p.parse_args()

    from drone2d_tpu.utils.runtime import setup_runtime, wait_for_accelerator

    setup_runtime()
    if not wait_for_accelerator():
        sys.exit("accelerator backend unavailable; aborting instead of hanging")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from drone2d_tpu.config import ALL_SCENARIOS
    from drone2d_tpu.eval.episode import run_episodes_multi
    from drone2d_tpu.eval.run import load_params, scenario_config

    scenarios = args.scenarios or list(ALL_SCENARIOS)
    cands = find_candidates(args.run_dirs, args.finals_only)
    if not cands:
        sys.exit("no candidates found")
    print(f"{len(cands)} candidates x {len(scenarios)} scenarios "
          f"x {args.episodes} episodes")

    stack = jax.tree.map(
        lambda *x: jnp.stack(x),
        *[load_params(path, step) for _, path, step in cands],
    )

    table = {label: {} for label, _, _ in cands}
    for scen in scenarios:
        cfg = scenario_config(scen)
        res = run_episodes_multi(
            cfg, stack, jax.random.PRNGKey(args.seed), args.episodes
        )
        n = np.maximum(
            res.success.sum(axis=1) + res.fail.sum(axis=1), 1)
        sr = res.success.sum(axis=1) / n
        cr = res.collision.sum(axis=1) / n
        for i, (label, _, _) in enumerate(cands):
            table[label][scen] = dict(
                success_rate=float(sr[i]), collision_rate=float(cr[i]),
                avg_ape=float(res.ape[i].mean()),
            )
        print(f"  {scen}: done (best SR {sr.max():.2f})")

    # ranking: published-SR coverage first, then published-AAPE coverage
    # (r5 dual-table goal: at-or-below the published "Reactive" AAPE too),
    # then mean SR
    rows = []
    for label, per in table.items():
        srs = {s: per[s]["success_rate"] for s in scenarios}
        mean_sr = sum(srs.values()) / len(srs)
        covered = sum(
            1 for s in scenarios
            if s in PUBLISHED_SR and srs[s] >= PUBLISHED_SR[s]
        )
        ape_covered = sum(
            1 for s in scenarios
            if s in PUBLISHED_AAPE and per[s]["avg_ape"] <= PUBLISHED_AAPE[s]
        )
        rows.append((covered, ape_covered, mean_sr, label, srs))
    rows.sort(reverse=True)

    width = max(len(r[3]) for r in rows)
    head = " ".join(f"{s[:6]:>6s}" for s in scenarios)
    print(f"\n{'candidate':>{width}s} cover aape meanSR {head}")
    for covered, ape_covered, mean_sr, label, srs in rows:
        vals = " ".join(f"{srs[s]:6.2f}" for s in scenarios)
        print(f"{label:>{width}s} {covered:5d} {ape_covered:4d} "
              f"{mean_sr:6.3f} {vals}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(table, f, indent=1)
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
