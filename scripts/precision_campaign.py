"""High-precision multi-agent evaluation campaigns.

The reference's campaigns are 100-episode loops (main.py:242-400), which
leaves ~±5pp of binomial noise on every published rate — too coarse to
distinguish a true stage_1 rate of 0.99 from 0.999 (the gap that decides
whether an agent can strictly cover the published stage_1 = 1.00,
barplots.py:22).  This tool runs N-thousand-episode campaigns for a whole
STACK of agents in chunked `run_episodes_multi` device programs and writes
per-agent per-scenario aggregates with exact success/failure counts.

    python scripts/precision_campaign.py artifacts/agent_s147/new_agent.npz \
        artifacts/agent_s250/new_agent.npz --scenarios stage_1 \
        --episodes 4000 --chunk 500 --seed 555 --out artifacts/stage1_assay.json

Chunk RNGs follow `eval.episode.campaign_keys`: chunk c of scenario s uses
`fold_in(fold_in(PRNGKey(seed), crc32(s) % 2**30), c)` — per-scenario
disjoint, process-stable, reproducible and extendable (more chunks = more
episodes, no key reuse).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("agents", nargs="+", help="agent .npz paths")
    p.add_argument("--scenarios", nargs="+", default=None,
                   help="subset of the 12 (default: all)")
    p.add_argument("--episodes", type=int, default=1000)
    p.add_argument("--chunk", type=int, default=500)
    p.add_argument("--seed", type=int, default=555)
    p.add_argument("--out", default=None)
    p.add_argument("--note", default="")
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

    scenarios = args.scenarios or list(ALL_SCENARIOS)
    labels = [os.path.relpath(a) for a in args.agents]
    stack = jax.tree.map(
        lambda *x: jnp.stack(x), *[load_params(a) for a in args.agents]
    )
    n_chunks = (args.episodes + args.chunk - 1) // args.chunk
    total = n_chunks * args.chunk

    report = {
        "seed": args.seed,
        "episodes": total,
        "chunk": args.chunk,
        "note": args.note,
        "agents": {lab: {} for lab in labels},
    }
    for scen in scenarios:
        cfg = scenario_config(scen)
        acc = None
        for key in campaign_keys(args.seed, scen, n_chunks):
            res = run_episodes_multi(cfg, stack, key, args.chunk)
            cols = dict(
                success=res.success.sum(axis=1), fail=res.fail.sum(axis=1),
                collision=res.collision.sum(axis=1),
                ape=res.ape.sum(axis=1), time=res.time_steps.sum(axis=1),
            )
            acc = cols if acc is None else {
                k: acc[k] + v for k, v in cols.items()
            }
        for i, lab in enumerate(labels):
            n = float(acc["success"][i] + acc["fail"][i])
            # Every episode reports ape/time exactly once, so those averages
            # divide by `total`; n can exceed total only via the deliberate
            # reference-parity dual latch (reach-end + step-cap on the same
            # step, eval/episode.py) — surface any divergence instead of
            # letting the averages silently skew (ADVICE r4).
            if n != total:
                print(f"WARNING: {lab}/{scen}: success+fail = {int(n)} != "
                      f"{total} episodes (dual-latch or lost outcome)",
                      flush=True)
            sr = float(acc["success"][i]) / max(n, 1.0)
            report["agents"][lab][scen] = dict(
                episodes=int(n),
                episodes_run=total,
                successes=int(acc["success"][i]),
                success_rate=sr,
                sr_stderr=float(np.sqrt(sr * (1 - sr) / max(n, 1.0))),
                collision_rate=float(acc["collision"][i]) / max(n, 1.0),
                avg_ape=float(acc["ape"][i]) / total,
                avg_flight_time=float(acc["time"][i]) / total,
            )
        best = max(report["agents"][lab][scen]["success_rate"] for lab in labels)
        print(f"{scen}: done over {total} episodes (best SR {best:.4f})", flush=True)

    for lab in labels:
        rows = report["agents"][lab]
        mean_sr = sum(r["success_rate"] for r in rows.values()) / len(rows)
        counts = " ".join(
            f"{s}:{r['successes']}/{r['episodes']}" for s, r in rows.items()
        )
        print(f"{lab}: mean SR {mean_sr:.4f}  {counts}", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
