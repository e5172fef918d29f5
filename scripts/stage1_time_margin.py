"""How much faster must an agent fly to clear the stage_1 timeout tail?

Every residual stage_1 failure of every strong agent is a timeout at the
1100-step cap with near-zero APE (stage1_failure_modes.py): perfect path
following at insufficient pace.  This tool measures the *margin*: it runs
stage_1 episodes with a doubled cap (2200) and reports the flight-time
distribution of episodes that finish in (1100, 2200] — the would-be
failures — plus episodes still running at 2200 (truly stuck) and
early terminations (aggressive-tilt), reported separately.
It also runs a deterministic-action pass: if mean behavior clears the cap
everywhere, the failures are sampling noise; if not, they are systematic
geometry (path-length tail).

    python scripts/stage1_time_margin.py artifacts/agent_s147/new_agent.npz \
        --episodes 2000 --out artifacts/campaigns/r4/stage1_margin_s147.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("agents", nargs="+")
    p.add_argument("--episodes", type=int, default=2000)
    p.add_argument("--chunk", type=int, default=500)
    p.add_argument("--cap", type=int, default=2200)
    p.add_argument("--seed", type=int, default=608)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from drone2d_tpu.utils.runtime import setup_runtime, wait_for_accelerator

    setup_runtime()
    if not wait_for_accelerator():
        sys.exit("accelerator backend unavailable; aborting")
    import numpy as np

    from drone2d_tpu.config import EnvConfig
    from drone2d_tpu.eval.episode import campaign_keys, run_episodes
    from drone2d_tpu.eval.run import load_params, scenario_config

    ref_cap = EnvConfig().n_steps  # 1100 (rl_config.py:16)
    cfg = scenario_config("stage_1").replace(n_steps=args.cap)
    n_chunks = (args.episodes + args.chunk - 1) // args.chunk

    report = {"seed": args.seed, "cap": args.cap, "ref_cap": ref_cap,
              "episodes": n_chunks * args.chunk, "agents": {}}
    # NOTE: the r4 committed stage1_margin.json predates the shared
    # campaign_keys scheme (used fold_in(PRNGKey(seed), c)); its numbers
    # remain valid for their recorded seed, streams just differ.
    for agent in args.agents:
        params = load_params(agent)
        rows = {}
        for det in (False, True):
            times, succ_n, stuck_n, early_n = [], 0, 0, 0
            for key in campaign_keys(args.seed, "stage_1", n_chunks):
                r = run_episodes(cfg, params, key, args.chunk,
                                 deterministic=det)
                succ = np.asarray(r.success, bool)
                t = np.asarray(r.time_steps)
                succ_n += int(succ.sum())
                # distinguish genuine timeouts at the doubled cap from
                # early terminations (aggressive-tilt; collisions are
                # impossible in stage_1)
                stuck_n += int((~succ & (t >= args.cap)).sum())
                early_n += int((~succ & (t < args.cap)).sum())
                times.extend(int(x) for x in t[succ])
            times = np.array(sorted(times))
            over = times[times > ref_cap]
            rows["deterministic" if det else "stochastic"] = dict(
                finish_within_ref_cap=int((times <= ref_cap).sum()),
                finish_over_ref_cap=int(over.size),
                stuck_at_cap=stuck_n,
                early_termination=early_n,
                over_cap_times=[int(x) for x in over],
                # pace multiplier that would pull each slow finisher under
                # the cap if the whole episode sped up uniformly
                needed_speedup=[round(float(x) / ref_cap, 3) for x in over],
                time_p50=float(np.percentile(times, 50)) if times.size else None,
                time_p99=float(np.percentile(times, 99)) if times.size else None,
                time_max=int(times.max()) if times.size else None,
            )
            print(f"{agent} det={det}: <=cap {rows['deterministic' if det else 'stochastic']['finish_within_ref_cap']}"
                  f" over-cap {over.size} stuck {stuck_n} early-term {early_n}"
                  f" p99 {rows['deterministic' if det else 'stochastic']['time_p99']}",
                  flush=True)
        report["agents"][agent] = rows

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
