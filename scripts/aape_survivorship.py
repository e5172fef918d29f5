"""AAPE survivorship analysis — quantify WHY the flagship's all-episode AAPE
exceeds the published "Reactive" table on 5 of 12 scenarios (VERDICT r4 #1a).

The published AAPE (reference barplots.py:8,26) averages APE over ALL
episodes of a 100-episode campaign.  The reference agents fail most hard
episodes (published SR: parallel 55%, perpendicular 28%, S_parallel 3%), and
an episode that ends in an early collision freezes its APE at death — so the
published AAPE is dominated by short, near-path death trajectories, while an
agent that *survives* those same episodes logs the (necessarily larger) APE
of the full avoidance detour.  This tool measures that effect directly
instead of arguing it:

- Runs PAIRED campaigns (`run_episodes_multi(..., same_episodes=True)`): the
  flagship and the four imported reference agents fly the IDENTICAL episode
  set per scenario (same spawn, path, obstacles, same policy-noise streams),
  so per-episode comparisons are apples-to-apples.
- Keeps PER-EPISODE (success, ape, time) rows (precision_campaign.py only
  keeps sums) and writes them to an .npz next to the JSON summary.
- Reports, per agent x scenario: AAPE over all / successful-only /
  failed-only episodes — and for the focal agent, AAPE *conditioned on the
  reference agent's outcome on the same episode* (the survivorship
  counterfactual: "what AAPE would the flagship publish if it only logged
  the episodes the reference agent survived?").

Usage (TPU, long-running — launch in background):

    python -u scripts/aape_survivorship.py \
        --focal artifacts/agent_s8004/new_agent.npz \
        --episodes 1000 --chunk 250 --seed 909 \
        --out artifacts/campaigns/r5/aape_survivorship.json

RNG follows the committed campaign scheme (eval.episode.campaign_keys).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Published "Reactive" AAPE per scenario (reference barplots.py:8,26) —
# single-sourced from the mirrored tables.
from drone2d_tpu.eval.barplots import PUBLISHED_AAPE  # noqa: E402

REFERENCE_IMPORTS = [
    "artifacts/imported/agent_17_90.npz",
    "artifacts/imported/agent_19_90.npz",
    "artifacts/imported/agent_20_90.npz",
    "artifacts/imported/agent_21_90.npz",
]


def _cond_mean(values, mask):
    import numpy as np

    n = int(mask.sum())
    return (float(values[mask].mean()) if n else None), n


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--focal", default="artifacts/agent_s8004/new_agent.npz")
    p.add_argument("--refs", nargs="*", default=REFERENCE_IMPORTS)
    p.add_argument("--scenarios", nargs="+", default=None)
    p.add_argument("--episodes", type=int, default=1000)
    p.add_argument("--chunk", type=int, default=250)
    p.add_argument("--seed", type=int, default=909)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    from drone2d_tpu.utils.runtime import setup_runtime, wait_for_accelerator

    setup_runtime()
    if not wait_for_accelerator():
        sys.exit("accelerator backend unavailable; aborting instead of hanging")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from drone2d_tpu.config import ALL_SCENARIOS
    from drone2d_tpu.eval.episode import campaign_keys, run_episodes_multi
    from drone2d_tpu.eval.run import load_params, scenario_config

    paths = [args.focal] + list(args.refs)
    labels = [os.path.splitext(os.path.basename(os.path.dirname(a) if
              os.path.basename(a) == "new_agent.npz" else a))[0] for a in paths]
    # colliding basenames would silently overwrite each other's report rows
    # (review r5): disambiguate with the agent index
    seen = set()
    for i, lab in enumerate(labels):
        if lab in seen:
            labels[i] = f"{lab}#{i}"
        seen.add(labels[i])
    all_params = [load_params(a) for a in paths]
    # The flagship is 128x128 while the imported reference agents are 64x64,
    # so one stacked pytree is impossible — group agents by param shape and
    # run each group under the SAME chunk keys.  Episode keys are
    # split(key, n_episodes) independent of the agent axis
    # (eval/episode.py:192), so per-episode pairing holds across groups.
    groups = {}  # shape-sig -> list of agent indices
    for i, prm in enumerate(all_params):
        sig = tuple(l.shape for l in jax.tree.leaves(prm))
        groups.setdefault(sig, []).append(i)
    group_stacks = [
        (idxs, jax.tree.map(lambda *x: jnp.stack(x),
                            *[all_params[i] for i in idxs]))
        for idxs in groups.values()
    ]
    scenarios = args.scenarios or list(ALL_SCENARIOS)
    n_chunks = (args.episodes + args.chunk - 1) // args.chunk

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    raw_npz = {}
    report = {
        "seed": args.seed, "episodes": n_chunks * args.chunk,
        "focal": labels[0], "agents": labels, "scenarios": {},
    }
    for scen in scenarios:
        cfg = scenario_config(scen)
        A, N = len(paths), n_chunks * args.chunk
        succ = np.zeros((A, N), dtype=bool)
        ape = np.zeros((A, N))
        time_s = np.zeros((A, N))
        for c, key in enumerate(campaign_keys(args.seed, scen, n_chunks)):
            lo = c * args.chunk
            for idxs, stack in group_stacks:
                res = run_episodes_multi(cfg, stack, key, args.chunk)
                succ[idxs, lo:lo + args.chunk] = res.success
                ape[idxs, lo:lo + args.chunk] = res.ape
                time_s[idxs, lo:lo + args.chunk] = res.time_steps
        raw_npz[f"{scen}/success"] = succ
        raw_npz[f"{scen}/ape"] = ape
        raw_npz[f"{scen}/time"] = time_s

        rows = {}
        for i, lab in enumerate(labels):
            s = succ[i]
            a_all = float(ape[i].mean())
            a_succ, n_succ = _cond_mean(ape[i], s)
            a_fail, n_fail = _cond_mean(ape[i], ~s)
            t_succ, _ = _cond_mean(time_s[i].astype(np.float64), s)
            t_fail, _ = _cond_mean(time_s[i].astype(np.float64), ~s)
            rows[lab] = dict(
                success_rate=float(s.mean()), n_success=n_succ, n_fail=n_fail,
                aape_all=a_all, aape_success=a_succ, aape_fail=a_fail,
                time_success=t_succ, time_fail=t_fail,
            )
        # survivorship counterfactuals: focal agent's AAPE conditioned on
        # each reference agent's outcome over the SAME episodes
        cond = {}
        for i, lab in enumerate(labels[1:], start=1):
            a_s, n_s = _cond_mean(ape[0], succ[i])
            a_f, n_f = _cond_mean(ape[0], ~succ[i])
            cond[lab] = dict(
                focal_aape_ref_success=a_s, n_ref_success=n_s,
                focal_aape_ref_fail=a_f, n_ref_fail=n_f,
            )
        report["scenarios"][scen] = dict(
            published_aape=PUBLISHED_AAPE.get(scen),
            agents=rows, focal_conditioned_on_ref=cond,
        )
        f = rows[labels[0]]
        print(
            f"{scen:>14s}: focal SR {f['success_rate']:.3f}  "
            f"AAPE all {f['aape_all']:.1f}  succ {f['aape_success'] or 0:.1f} "
            f" fail {(f['aape_fail'] if f['aape_fail'] is not None else float('nan')):.1f}  "
            f"(published {PUBLISHED_AAPE.get(scen)})",
            flush=True,
        )

    with open(args.out, "w") as fp:
        json.dump(report, fp, indent=1)
    np.savez_compressed(args.out.replace(".json", "_raw.npz"), **raw_npz)
    print(f"wrote {args.out} (+ raw npz)")


if __name__ == "__main__":
    main()
