"""Package a hunt candidate as a shipped flagship artifact.

Creates artifacts/agent_s<seed>/ in the same shape as the earlier crowns
(agent_s147 et al.): new_agent.npz + 100-episode 12-scenario campaign
summaries under both committed eval RNGs (seed 0 = in-selection, seed 777
= held-out) + optionally a campaign_n1000_summary.json converted from a
scripts/precision_campaign.py report.

    python scripts/package_agent.py results/r4_h5_pp8/seed_5004/ckpt_12058624.npz \
        --seed 5004 --checkpoint-step 12058624 \
        --note "hunt 5 (PP_rew_max=8 pace fine-tune from agent_s147)" \
        --n1000 artifacts/campaigns/r4/h5_finalists_n1000.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def campaign(cfg_fn, params, eval_seed: int, episodes: int):
    import jax
    import numpy as np

    from drone2d_tpu.config import ALL_SCENARIOS
    from drone2d_tpu.eval.episode import run_episodes

    rows = []
    for scen in ALL_SCENARIOS:
        # committed eval-RNG convention (scripts/select_agents.py,
        # eval/run.py): the raw PRNGKey(eval_seed), per-episode keys split
        # inside run_episodes — numbers comparable across all select tables
        key = jax.random.PRNGKey(eval_seed)
        r = run_episodes(cfg_fn(scen), params, key, episodes)
        rows.append(dict(
            scenario=scen,
            episodes=episodes,
            success_rate=float(np.mean(r.success)),
            collision_rate=float(np.mean(r.collision)),
            avg_ape=float(np.mean(r.ape)),
            avg_flight_time=float(np.mean(r.time_steps)),
        ))
        print(f"  seed {eval_seed} {scen}: SR {rows[-1]['success_rate']:.2f}",
              flush=True)
    return rows


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("agent", help="candidate .npz")
    p.add_argument("--seed", type=int, required=True, help="training seed")
    p.add_argument("--checkpoint-step", type=int, required=True)
    p.add_argument("--note", default="")
    p.add_argument("--episodes", type=int, default=100)
    p.add_argument("--n1000", default=None,
                   help="precision_campaign report to convert (must contain "
                        "this agent's path as a key)")
    p.add_argument("--out-dir", default=None)
    args = p.parse_args()

    from drone2d_tpu.utils.runtime import setup_runtime, wait_for_accelerator

    setup_runtime()
    if not wait_for_accelerator():
        sys.exit("accelerator backend unavailable; aborting")

    from drone2d_tpu.eval.barplots import PUBLISHED_SR
    from drone2d_tpu.eval.run import load_params, scenario_config

    out_dir = args.out_dir or os.path.join("artifacts", f"agent_s{args.seed}")
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, "new_agent.npz")
    if os.path.abspath(args.agent) != os.path.abspath(dst):
        shutil.copyfile(args.agent, dst)
    params = load_params(dst)
    # hidden sizes straight from the loaded param pytree (ADVICE r4: key-name
    # scanning over the npz silently produced [] if naming ever changed)
    hidden = [int(layer.w.shape[1]) for layer in params.pi]
    assert hidden, "loaded params have no pi hidden layers"

    for eval_seed, fname, tag in (
        (0, "summary.json", "IN-SELECTION (seed 0 ranked the hunt pool)"),
        (777, "campaign_seed777_summary.json",
         "HELD-OUT robustness RNG (selection used seed 0)"),
    ):
        rows = campaign(scenario_config, params, eval_seed, args.episodes)
        coverage = sum(r["success_rate"] >= PUBLISHED_SR[r["scenario"]]
                       for r in rows)
        doc = dict(
            seed=args.seed, checkpoint_step=args.checkpoint_step,
            eval_seed=eval_seed, note=f"{args.note}; eval seed {eval_seed} — {tag}",
            published_coverage=coverage,
            mean_success_rate=round(
                sum(r["success_rate"] for r in rows) / len(rows), 4),
            hidden_sizes=hidden, scenarios=rows,
        )
        with open(os.path.join(out_dir, fname), "w") as f:
            json.dump(doc, f, indent=1)
        print(f"{fname}: coverage {coverage}/12 mean "
              f"{doc['mean_success_rate']}", flush=True)

    if args.n1000:
        with open(args.n1000) as f:
            rep = json.load(f)
        # report labels are relpaths (precision_campaign.py); compare on
        # abspath so absolute agent paths / different cwds still match
        match = [lab for lab in rep["agents"]
                 if os.path.abspath(lab) == os.path.abspath(args.agent)]
        if not match:
            sys.exit(f"{args.agent} not found in {args.n1000}")
        rows = []
        for scen, r in rep["agents"][match[0]].items():
            rows.append(dict(
                scenario=scen, episodes=r["episodes"],
                success_rate=r["success_rate"],
                sr_stderr=round(r["sr_stderr"], 4),
                collision_rate=r["collision_rate"],
                avg_ape=r["avg_ape"], avg_flight_time=r["avg_flight_time"],
            ))
        coverage = sum(r["success_rate"] >= PUBLISHED_SR[r["scenario"]]
                       for r in rows)
        doc = dict(
            seed=args.seed, eval_seed=rep["seed"],
            note=(f"{args.note}; {rep['episodes']}-episode high-precision "
                  "campaign (fresh RNG, not used in any selection)"),
            published_coverage=coverage,
            mean_success_rate=round(
                sum(r["success_rate"] for r in rows) / len(rows), 4),
            scenarios=rows,
        )
        with open(os.path.join(out_dir, "campaign_n1000_summary.json"), "w") as f:
            json.dump(doc, f, indent=1)
        print(f"campaign_n1000_summary.json: coverage {coverage}/12 mean "
              f"{doc['mean_success_rate']}", flush=True)


if __name__ == "__main__":
    main()
