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
AGENTS = {
    # name -> (zip, committed campaign dir, scenario subdir glob style)
    "agent_17_90": (
        f"{REF}/ppo_agents/PFCA_see_3_obs_17_90.zip",
        f"{REF}/best_models_config_and_res/run17see3/res",
    ),
    "agent_21_90": (
        f"{REF}/ppo_agents/PFCA_see_3_obs_21_90.zip",
        f"{REF}/Tests/agent_21/test_0",
    ),
}


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


def committed_scenarios(res_dir: str) -> dict:
    """scenario -> parsed results.txt for every scenario dir present."""
    out = {}
    for entry in sorted(os.listdir(res_dir)):
        d = os.path.join(res_dir, entry)
        if not os.path.isdir(d) or entry == "plots":
            continue
        txts = [f for f in os.listdir(d) if f.endswith("results.txt")]
        if txts:
            out[entry] = parse_results_txt(os.path.join(d, txts[0]))
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
        zip_path, res_dir = AGENTS[name]
        params = load_sb3_agent(zip_path)
        ref = committed_scenarios(res_dir)
        rows = []
        for scenario, ref_row in ref.items():
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
            n_ref = ref_row["successes"] + ref_row["fails"]
            z_sr = [
                two_prop_z(o["success_rate"], ref_row["success_rate"],
                           args.episodes, n_ref)
                for o in ours
            ]
            row = dict(
                scenario=scenario, ref=ref_row, ours=ours, z_success=z_sr,
                agree=all(abs(z) <= 3.0 for z in z_sr),
            )
            rows.append(row)
            flag = "ok " if row["agree"] else "DIFF"
            sr_ours = "/".join(f"{o['success_rate']:.2f}" for o in ours)
            ape_ours = "/".join(f"{o['avg_ape']:.0f}" for o in ours)
            print(
                f"[{flag}] {name} {scenario:>14s}: SR ref {ref_row['success_rate']:.2f}"
                f" ours {sr_ours}  (z={'/'.join(f'{z:+.1f}' for z in z_sr)})"
                f"  APE ref {ref_row['avg_ape']:.0f} ours {ape_ours}"
            )
        report["agents"][name] = dict(zip=zip_path, committed=res_dir, rows=rows)

    out_path = os.path.join(args.out, "report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    n_rows = sum(len(a["rows"]) for a in report["agents"].values())
    n_agree = sum(r["agree"] for a in report["agents"].values() for r in a["rows"])
    print(f"\n{n_agree}/{n_rows} scenario campaigns agree (|z| <= 3); wrote {out_path}")


if __name__ == "__main__":
    main()
