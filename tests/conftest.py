"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices instead (SURVEY.md §4).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Make the repo root importable when pytest is invoked from anywhere.
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The container's sitecustomize registers an 'axon' TPU backend that wins over
# the JAX_PLATFORMS env var, so pin the platform through jax.config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persist XLA CPU executables across pytest invocations: the smoke subset's
# wall time is dominated by compiles, and the cache makes repeat runs (CI
# re-runs, local iteration) start warm. Same directory bench.py uses; CPU
# and TPU entries are keyed by platform so they never collide.
try:
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_traceback_in_locations_limit", 0)
except Exception:
    pass
