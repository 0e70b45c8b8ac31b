"""Persistent XLA compilation cache shared by every sesa_tpu entry point.

Cold-compiling a flagship demix program costs minutes on this backend;
the cache makes every later process start in seconds for shapes it has
seen. The default location is ``$SESA_CACHE_DIR``, else ``.jax_cache``
next to the repo root (so benches, the CLI, the GUI, and the warmup tool
all share one cache), else ``~/.cache/sesa_tpu/jax``.
"""

from __future__ import annotations

import os

import jax

_ENABLED = False


def cache_dir() -> str:
    env = os.environ.get("SESA_CACHE_DIR")
    if env:
        return env
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # .git is a FILE in worktree/submodule checkouts — exists, not isdir
    if os.path.exists(os.path.join(repo, ".git")) or os.path.isdir(
            os.path.join(repo, ".jax_cache")):
        return os.path.join(repo, ".jax_cache")
    return os.path.expanduser("~/.cache/sesa_tpu/jax")


def enable_persistent_cache() -> bool:
    """Idempotently turn on the persistent compile cache. Returns True if
    enabled (False when the jax build lacks the config knobs)."""
    global _ENABLED
    if _ENABLED:
        return True
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
        # the Pallas kernels embed caller tracebacks in MLIR locations,
        # which destabilizes the cache key across otherwise-identical runs
        jax.config.update("jax_traceback_in_locations_limit", 0)
    except Exception:
        return False
    _ENABLED = True
    return True
