"""Process-level runtime setup shared by all CLI entry points.

Biggest lever: the persistent XLA compilation cache.  The drone step program
is large (scan over rollout x vmapped env x minibatch epochs) and a cold
compile through a remote-TPU tunnel costs minutes; with the cache enabled a
re-run of the same shapes loads the executable in seconds.  The reference
has no equivalent concern (no compiler in its stack).
"""

from __future__ import annotations

import os


def setup_runtime(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache + sane defaults.  Call before
    building any jitted function (importing jax is fine)."""
    import jax

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
