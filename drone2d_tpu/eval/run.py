"""Evaluation CLI — the reference's `mode == "test"` harness (`main.py:242-400`)
as a command:

    python -m drone2d_tpu.eval.run --agent logs/new_agent.npz \\
        --scenario corridor --episodes 100

Runs all episodes as ONE vectorized device program (vs the reference's
sequential while-loop), then writes the identical artifact set: results.txt,
collisions/rewards/apes/time_spent .npy, flight_paths JSON, flight-path
overlay PNG, and a replay GIF.  `--scenario all` sweeps the 12-scenario
suite (7 spatial + 5 curriculum stages, rl_config.py:45-58).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import numpy as np

from drone2d_tpu.config import (
    ALL_SCENARIOS,
    STAGE_SCENARIOS,
    TEST_SCENARIOS,
    EnvConfig,
)
from drone2d_tpu.eval.artifacts import write_campaign
from drone2d_tpu.eval.episode import run_episodes
from drone2d_tpu.models.policy import ActorCriticParams, flat_dict_to_params


def load_params(path: str, step: Optional[int] = None) -> Optional[ActorCriticParams]:
    """Load policy params from a train-CLI .npz or an orbax checkpoint dir
    (optionally at a specific saved step).  Returns None for the literal
    'random' (random-policy baseline)."""
    if path == "random":
        return None
    if path.endswith(".npz"):
        with np.load(path) as z:
            return flat_dict_to_params(dict(z))
    # orbax checkpoint directory: restore raw pytree, pick params subtree
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.abspath(path))
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {path!r}")
    payload = mgr.restore(step)
    mgr.close()
    flat = payload["params"]
    # StandardRestore without a template returns nested dicts mirroring the
    # NamedTuple fields
    import jax.numpy as jnp

    from drone2d_tpu.models.policy import Dense

    def dense(d):
        return Dense(w=jnp.asarray(d["w"]), b=jnp.asarray(d["b"]))

    return ActorCriticParams(
        pi=tuple(dense(l) for l in flat["pi"]),
        vf=tuple(dense(l) for l in flat["vf"]),
        pi_out=dense(flat["pi_out"]),
        vf_out=dense(flat["vf_out"]),
        log_std=jnp.asarray(flat["log_std"]),
    )


def _derive_agent_name(agent_path: str) -> str:
    """Artifact directory name for an agent path.

    `agent_<nr>`-style paths (the reference's Tests/<agent> convention) keep
    that name; anything else (e.g. the train CLI's default `new_agent.npz`)
    falls back to the full basename — previously `new_agent.npz` mangled to
    'agent_agent'.  Directory paths (orbax checkpoints) use the directory
    basename."""
    import re

    stem = os.path.basename(os.path.normpath(agent_path)).split(".")[0]
    m = re.fullmatch(r"agent[_-](\w+)", stem)
    if m:
        return f"agent_{m.group(1)}"
    return stem or "agent"


def scenario_config(scenario: str, base: Optional[EnvConfig] = None) -> EnvConfig:
    """Env config for one scenario name, mirroring env_test_config derivation
    (rl_config.py:63-79): spatial scenarios -> mode='test'; stage_k ->
    mode='curriculum' with the stage forced."""
    from drone2d_tpu.config import EXTRA_SCENARIOS

    base = base or EnvConfig()
    if scenario in TEST_SCENARIOS + EXTRA_SCENARIOS:
        return base.replace(mode="test", scenario=scenario)
    if scenario in STAGE_SCENARIOS:
        return base.replace(mode="curriculum", scenario=scenario)
    raise ValueError(
        f"unknown scenario {scenario!r} "
        f"(choose from {ALL_SCENARIOS + EXTRA_SCENARIOS})"
    )


def evaluate(
    agent_path: str,
    scenario: str,
    episodes: int,
    *,
    seed: int = 0,
    deterministic: bool = False,
    out_root: str = "Tests",
    gif_root: Optional[str] = "Gifs",
    agent_name: Optional[str] = None,
    checkpoint_step: Optional[int] = None,
    gif_all_episodes: bool = False,
) -> dict:
    params = load_params(agent_path, checkpoint_step)
    cfg = scenario_config(scenario)
    results = run_episodes(
        cfg, params, jax.random.PRNGKey(seed), episodes,
        deterministic=deterministic,
    )
    agent = agent_name or _derive_agent_name(agent_path)
    out_dir = write_campaign(
        cfg, results, agent=agent, agent_path=agent_path,
        scenario=scenario, root=out_root, gif_root=gif_root,
        gif_all_episodes=gif_all_episodes,
    )
    n = max(int(np.sum(results.success) + np.sum(results.fail)), 1)
    summary = dict(
        scenario=scenario,
        episodes=episodes,
        success_rate=float(np.sum(results.success)) / n,
        collision_rate=float(np.sum(results.collision)) / n,
        avg_ape=float(np.mean(results.ape)),
        avg_flight_time=float(np.mean(results.time_steps.astype(np.float64))),
        out_dir=out_dir,
    )
    print(
        f"{scenario:>14s}: SR {summary['success_rate']:.2f}  "
        f"CR {summary['collision_rate']:.2f}  APE {summary['avg_ape']:.1f}  "
        f"T {summary['avg_flight_time']:.1f}  -> {out_dir}"
    )
    return summary


def main(argv=None) -> None:
    from drone2d_tpu.utils.runtime import setup_runtime, wait_for_accelerator

    setup_runtime()
    if not wait_for_accelerator():
        raise SystemExit(
            "accelerator backend unavailable; aborting instead of hanging"
        )
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--agent", required=True,
                   help=".npz params, orbax checkpoint dir, or 'random'")
    p.add_argument("--scenario", default="large",
                   help="scenario name or 'all' (choices: %s)" % ",".join(ALL_SCENARIOS))
    p.add_argument("--episodes", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--deterministic", action="store_true")
    p.add_argument("--out-root", default="Tests")
    p.add_argument("--gif-root", default="Gifs")
    p.add_argument("--no-gif", action="store_true")
    p.add_argument("--gif-all", action="store_true",
                   help="one GIF spanning ALL campaign episodes (the "
                   "reference's test-mode behavior, main.py:259-295) instead "
                   "of a single episode")
    p.add_argument("--agent-name", default=None)
    p.add_argument("--checkpoint-step", type=int, default=None,
                   help="orbax checkpoint step to load (default: latest)")
    args = p.parse_args(argv)

    scenarios = ALL_SCENARIOS if args.scenario == "all" else (args.scenario,)
    for s in scenarios:
        evaluate(
            args.agent, s, args.episodes,
            seed=args.seed, deterministic=args.deterministic,
            out_root=args.out_root,
            gif_root=None if args.no_gif else args.gif_root,
            agent_name=args.agent_name,
            checkpoint_step=args.checkpoint_step,
            gif_all_episodes=args.gif_all,
        )


if __name__ == "__main__":
    main()
