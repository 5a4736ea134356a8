"""Persistent XLA compilation cache (SURVEY §3.4 startup-cost parity).

The reference pays its startup cost loading a 100 MB vocabulary binary
(System.cc:109); ours is XLA compilation — the ORB pyramid graph alone takes
minutes to compile on a remote-attached TPU. The persistent cache makes that
a once-per-machine cost: every entry point (run_kitti, benchmarks,
__graft_entry__) calls `enable_persistent_cache()` before first jit.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    # Honor JAX_PLATFORMS=cpu BEFORE any config touch: the container's
    # sitecustomize pins the remote TPU platform, and the cache-config
    # updates below can trigger backend initialization — after which the
    # platform can no longer be changed (bench_dist once silently ran its
    # "8-way CPU mesh" on the single TPU chip because of this ordering).
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    cache_dir = path or os.environ.get(
        "SQRTLM_JAX_CACHE", os.path.expanduser("~/.cache/sqrtlm_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without the knobs — harmless
