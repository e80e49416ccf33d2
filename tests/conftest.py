"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding paths are validated on virtual CPU devices
(xla_force_host_platform_device_count), as real multi-chip hardware is not
available in CI.
"""
import os

# Force CPU: the ambient environment may point JAX at a (single, exclusive)
# TPU chip via JAX_PLATFORMS=axon; tests must not contend for it. Set
# BTS_TEST_TPU=1 to run tests on the real chip deliberately.
if not os.environ.get("BTS_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # sitecustomize.py imports jax at interpreter startup (axon PJRT
    # registration), so the env var alone is snapshotted too early —
    # update the live config as well.
    import jax
    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: repeat test runs skip XLA compiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
