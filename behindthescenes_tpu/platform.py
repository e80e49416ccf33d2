"""Platform selection helper.

The runtime image registers the TPU PJRT plugin from sitecustomize.py at
interpreter startup, which imports jax and snapshots JAX_PLATFORMS before
user code runs. Entry points call `apply_platform_env()` first so that a
JAX_PLATFORMS value set on the command line (e.g. `JAX_PLATFORMS=cpu python
train.py ...`) actually takes effect.
"""
from __future__ import annotations

import os


def bool_env(name: str, default: bool) -> bool:
    """Strict truthy/falsy env-flag parser shared by all BTS_* toggles.

    Unrecognized values raise instead of silently inverting the default
    (a typo like BTS_EVAL_SHARD=true must not turn multi-device eval off).
    """
    flag = os.environ.get(name)
    if flag is None:
        return default
    low = flag.strip().lower()
    if low in ("1", "true", "on", "yes"):
        return True
    if low in ("0", "false", "off", "no", ""):
        return False
    raise ValueError(f"{name}={flag!r}: expected 1/0, true/false, on/off, "
                     "or yes/no")


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


_barrier_round = iter(range(1 << 62))


def multihost_barrier(tag: str = "", timeout_ms: int = 600_000):
    """Align all hosts via the jax.distributed coordination-service KV
    store (no device collective, minutes-scale timeout).

    Why not multihost_utils.sync_global_devices: that spins up the
    host-level gloo context, whose rendezvous window is a fixed ~30 s —
    hosts legitimately skew past it during STARTUP (eager init compiles,
    dataset construction, compile-cache races), observed as
    `Gloo context initialization failed: DEADLINE_EXCEEDED` in the
    2-process test. Call this once after per-host setup, before the first
    collective-bearing construct; afterwards the compiled steps keep hosts
    in lockstep by construction. No-op single-process and on jax versions
    without the internal client handle."""
    import jax
    if jax.process_count() == 1:
        return
    try:
        from jax._src import distributed
        client = distributed.global_state.client
        if client is None:
            return
        rnd = next(_barrier_round)
        client.key_value_set(f"bts/barrier/{tag}/{rnd}/{jax.process_index()}",
                             "1")
        for p in range(jax.process_count()):
            client.blocking_key_value_get(f"bts/barrier/{tag}/{rnd}/{p}",
                                          timeout_ms)
    except (ImportError, AttributeError):
        pass
