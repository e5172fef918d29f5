"""Tracing / profiling helpers (SURVEY.md §5.1: the reference has none —
its only runtime introspection is termination prints, drone_2d_env.py:596-608).

Two tools:
* `trace(dir)` — context manager around `jax.profiler` producing a
  TensorBoard-loadable XPlane trace of every device program inside.
* `phase_timer()` — lightweight wall-clock phase accounting for the train
  loop (rollout / gae / update / host IO), printed or written as JSONL.

Usage:
    with trace("logs/profile"):
        state, metrics = update(state)

    pt = PhaseTimer()
    with pt.phase("rollout"): ...
    print(pt.summary())
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    def __init__(self) -> None:
        self._acc: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, *, block_on=None) -> Iterator[None]:
        """Time a phase; pass block_on=<pytree> to include device completion
        (otherwise async dispatch makes phases look instant)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self._acc[name] += time.perf_counter() - t0
            self._count[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self._acc[k],
                "calls": self._count[k],
                "mean_ms": 1e3 * self._acc[k] / max(self._count[k], 1),
            }
            for k in self._acc
        }

    def dump(self, path: str) -> None:
        with open(path, "a") as f:
            f.write(json.dumps(self.summary()) + "\n")
