"""Multi-host training setup — SPMD over a pod slice.

The reference cannot scale past one machine (SubprocVecEnv over local
processes, `main.py:183-190`).  Here multi-host is the same program as
single-host: every host runs the SAME `shard_update` with a mesh spanning
all devices of all hosts; XLA routes the pmean/psum collectives over ICI
within a slice and DCN across slices.  The only host-specific work is
(a) initializing the distributed runtime and (b) giving each host its own
env-slice RNG fold — which `shard_init` already does per shard index.

Usage (same script on every host; TPU pods auto-discover coordinates):

    from drone2d_tpu.parallel.multihost import init_distributed, host_info
    init_distributed()                       # no-op on single host
    learner = PPOLearner(env_cfg, ppo_cfg, num_envs=GLOBAL_ENVS)
    mesh = make_mesh(jax.devices())          # global devices, all hosts
    state = shard_init(mesh, learner, key)   # key must be identical on hosts
    update = shard_update(mesh, learner)

Checkpointing: orbax writes from every process against a shared filesystem
(GCS) path; `utils.checkpoint` already device_gets replicated leaves, which
is host-consistent because params are fully replicated.

Testing without a pod: the driver's `dryrun_multichip` and the test suite
exercise the identical mesh/shard_map path on N virtual CPU devices
(`--xla_force_host_platform_device_count`); multi-host differs only in the
runtime init below, which is a thin wrapper over
`jax.distributed.initialize`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax


@dataclasses.dataclass(frozen=True)
class HostInfo:
    process_index: int
    process_count: int
    local_device_count: int
    global_device_count: int

    @property
    def is_coordinator(self) -> bool:
        return self.process_index == 0


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> HostInfo:
    """Initialize the JAX distributed runtime when running multi-process.

    On TPU pods all arguments are auto-discovered from the environment —
    call with no args.  On CPU/GPU clusters pass them explicitly.  Safe to
    call on a single host (initialize is skipped).

    NOTE: the decision to initialize is made from the arguments and the
    environment ONLY — `jax.distributed.initialize` must run before the
    first backend query, and even `jax.process_count()` initializes the
    backend, so no jax state may be consulted here.  (Exercised end-to-end
    by scripts/multihost_smoke.py: 2 real processes, one global mesh.)"""
    explicit = coordinator_address is not None or num_processes is not None
    if explicit or _looks_like_pod():
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError:
            pass  # already initialized
    return host_info()


def _looks_like_pod() -> bool:
    import os

    return any(
        os.environ.get(k)
        for k in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")
    )


def host_info() -> HostInfo:
    return HostInfo(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_device_count=jax.local_device_count(),
        global_device_count=jax.device_count(),
    )
