"""Process-level runtime setup shared by all CLI entry points.

Biggest lever: the persistent XLA compilation cache.  The drone step program
is large (scan over rollout x vmapped env x minibatch epochs) and a cold
compile through a remote-TPU tunnel costs minutes; with the cache enabled a
re-run of the same shapes loads the executable in seconds.  The reference
has no equivalent concern (no compiler in its stack).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def wait_for_accelerator(
    timeout_s: float = 90.0,
    retries: int = 10,
    retry_wait_s: float = 60.0,
    platform: str | None = None,
) -> bool:
    """Block until the accelerator backend initializes, probing from a
    subprocess so a wedged PJRT init cannot hang the caller.

    Failure-detection rail (SURVEY.md §5.3): on the remote-TPU tunnel a
    killed device process can wedge the chip, after which the *next*
    process blocks forever inside backend init (observed: 62 min of silence
    with 2 s of CPU).  `jax.devices()` in-process cannot be timed out, so we
    probe in a child with a hard timeout and retry.  Returns True when a
    probe succeeds, False if all retries fail (callers should abort with a
    clear message rather than hang).  CPU-only runs succeed immediately.
    """
    # `platform` pins the child via jax.config (NOT the JAX_PLATFORMS env
    # var: this image's site hook force-registers the remote-TPU plugin from
    # the env var at backend init, so only the config route truly avoids it).
    # Defaults to DRONE2D_PLATFORM so the probe targets the same backend the
    # caller will run on (see setup_runtime).
    platform = platform or os.environ.get("DRONE2D_PLATFORM")
    pin = (
        f"jax.config.update('jax_platforms', {platform!r}); " if platform else ""
    )
    probe = f"import jax; {pin}jax.devices()"
    for attempt in range(1, retries + 1):
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=timeout_s,
                capture_output=True,
                env=os.environ.copy(),
            )
            if r.returncode == 0:
                return True
            msg = (r.stderr or b"").decode(errors="replace").strip().splitlines()
            detail = msg[-1] if msg else "unknown error"
        except subprocess.TimeoutExpired:
            detail = f"probe hung > {timeout_s:.0f}s (wedged backend?)"
        if attempt < retries:
            print(
                f"[runtime] accelerator probe {attempt}/{retries} failed "
                f"({detail}); retrying in {retry_wait_s:.0f}s",
                flush=True,
            )
            time.sleep(retry_wait_s)
        else:
            print(
                f"[runtime] accelerator unavailable after {retries} probes "
                f"({detail})",
                flush=True,
            )
    return False


def setup_runtime(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache + sane defaults.  Call before
    building any jitted function (importing jax is fine)."""
    import jax

    # DRONE2D_PLATFORM=cpu runs any CLI on the host backend (e.g. when no
    # accelerator is attached, or the remote-TPU tunnel is down).  Must use
    # jax.config — the JAX_PLATFORMS env var cannot override this image's
    # site hook (see wait_for_accelerator).
    platform = os.environ.get("DRONE2D_PLATFORM")
    if platform:
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass

    cache_dir = cache_dir or os.environ.get(
        "DRONE2D_COMPILE_CACHE", os.path.expanduser("~/.cache/drone2d_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags: cache is best-effort
