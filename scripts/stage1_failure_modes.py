"""Classify an agent's residual stage_1 failures.

The published stage_1 success rate is 1.00 (barplots.py:22); chasing it
needs to know WHAT the last ~0.5% of failures are.  Possible ends
(drone_2d_env.py:567-610): timeout at the 1100-step cap (the round-1
slow-flight attractor), aggressive-alpha termination (|alpha| >= pi/2), or
collision (impossible in stage_1 — no obstacles).  For timeouts we also
report how far from the goal the drone ended (near-miss vs stuck).

    python scripts/stage1_failure_modes.py <agent.npz> --episodes 2000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("agent")
    p.add_argument("--episodes", type=int, default=2000)
    p.add_argument("--chunk", type=int, default=500)
    p.add_argument("--seed", type=int, default=606)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from drone2d_tpu.utils.runtime import setup_runtime, wait_for_accelerator

    setup_runtime()
    if not wait_for_accelerator():
        sys.exit("accelerator backend unavailable; aborting")
    import numpy as np

    from drone2d_tpu.eval.episode import campaign_keys, run_episodes
    from drone2d_tpu.eval.run import load_params, scenario_config

    cfg = scenario_config("stage_1")
    params = load_params(args.agent)
    cap = cfg.n_steps  # the cap the episodes actually run with

    n_to, n_aa, n_coll, n_succ, n_fail = 0, 0, 0, 0, 0
    to_ape, aa_t = [], []
    n_chunks = (args.episodes + args.chunk - 1) // args.chunk
    # NOTE: the r4 committed artifact (stage1_failmodes_s1014.json) predates
    # the shared campaign_keys scheme and used fold_in(PRNGKey(seed), c);
    # numbers remain valid for their recorded seed, streams just differ.
    for key in campaign_keys(args.seed, "stage_1", n_chunks):
        r = run_episodes(cfg, params, key, args.chunk)
        succ = r.success.astype(bool)
        fail = r.fail.astype(bool)
        coll = r.collision.astype(bool)
        timeout = fail & (r.time_steps >= cap) & ~coll
        aa = fail & ~timeout & ~coll
        n_succ += int(succ.sum()); n_fail += int(fail.sum())
        n_to += int(timeout.sum()); n_aa += int(aa.sum())
        n_coll += int((fail & coll).sum())
        for i in np.nonzero(timeout)[0]:
            to_ape.append(float(r.ape[i]))
        for i in np.nonzero(aa)[0]:
            aa_t.append(int(r.time_steps[i]))

    rep = dict(
        agent=args.agent, episodes=n_succ + n_fail, successes=n_succ,
        failures=n_fail, timeouts=n_to, aggressive_alpha=n_aa,
        collisions=n_coll,
        timeout_apes=sorted(to_ape),
        aa_end_steps=sorted(aa_t),
    )
    print(json.dumps(rep, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rep, f, indent=1)


if __name__ == "__main__":
    main()
