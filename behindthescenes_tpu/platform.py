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
