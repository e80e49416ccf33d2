"""Platform selection helper.

The runtime image registers the TPU PJRT plugin from sitecustomize.py at
interpreter startup, which imports jax and snapshots JAX_PLATFORMS before
user code runs. Entry points call `apply_platform_env()` first so that a
JAX_PLATFORMS value set on the command line (e.g. `JAX_PLATFORMS=cpu python
train.py ...`) actually takes effect.
"""
from __future__ import annotations

import os


def apply_platform_env():
    import jax
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backends already initialized; keep whatever is live
    # Persistent compilation cache: remote-TPU compiles take 30-90s per
    # jitted shape, so relaunches (resume, bench reruns) otherwise pay
    # minutes of recompiles. Harmless if the backend cannot serialize
    # executables (the cache just stays empty).
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        try:
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/jax_compile_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              2.0)
        except Exception:
            pass


def maybe_init_distributed(config: dict | None = None):
    """Multi-host initialization (replaces the reference's idist backend
    selection, SURVEY.md §5.8): call jax.distributed.initialize when a
    coordinator is configured — via config keys (coordinator_address,
    num_processes, process_id) or the standard cluster env vars JAX
    auto-detects. Single-process runs skip it. Returns (process_index,
    process_count)."""
    import jax
    config = config or {}
    coord = config.get("coordinator_address") \
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(config.get(
                "num_processes", os.environ.get("JAX_NUM_PROCESSES", 1))),
            process_id=int(config.get(
                "process_id", os.environ.get("JAX_PROCESS_ID", 0))))
    return jax.process_index(), jax.process_count()
