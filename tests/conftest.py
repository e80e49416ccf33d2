"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding paths are validated on virtual CPU devices
(xla_force_host_platform_device_count), as real multi-chip hardware is not
available in CI.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
