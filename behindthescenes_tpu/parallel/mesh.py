"""Device mesh + sharding helpers.

The reference's only training parallelism is DDP over NCCL
(SURVEY.md §2.7; reference train.py:20-32, ignite idist). The TPU-native
equivalent: a 1-D `data` mesh axis; batches shard over it, parameters
replicate, and XLA compiles the gradient all-reduce into the step (psum over
ICI). No backend selection machinery is needed — `jax.distributed` +
NamedSharding covers single-host, slice, and multi-slice.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard every leaf along its leading (batch) dimension. Leaves whose
    batch dim does not divide the mesh (e.g. batch-1 eval samples) are
    replicated instead.

    Multi-host: each host holds its OWN loader batch (the per-host dataset
    shard, loader.shard_for_host); the global batch is their concatenation
    along dim 0, assembled with jax.make_array_from_process_local_data —
    no cross-host data movement, each host's samples land on its own
    devices. Replicating a leaf that does not divide would silently pick
    one host's values, so that case raises instead."""
    n_dev = mesh.devices.size
    sharding = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    n_proc = jax.process_count()

    if n_proc > 1:
        def put(x):
            if hasattr(x, "ndim") and x.ndim >= 1 \
                    and (x.shape[0] * n_proc) % n_dev == 0:
                return jax.make_array_from_process_local_data(
                    sharding, np.asarray(x))
            raise ValueError(
                f"multi-host batch leaf of shape {getattr(x, 'shape', x)} "
                f"cannot shard a global batch of {x.shape[0]}*{n_proc} "
                f"over {n_dev} devices, and replication would drop the "
                "other hosts' samples")
        return jax.tree_util.tree_map(put, batch)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n_dev == 0:
            return jax.device_put(x, sharding)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_mesh_2d(devices=None, data: int = 1, rays: int = 0) -> Mesh:
    """2-D mesh (data, rays): batches shard over `data`; full-frame renders
    shard their ray dimension over `rays` — the model's sequence-parallel
    analogue (SURVEY.md §5.7: rays are embarrassingly parallel given the
    replicated feature grid)."""
    devices = list(devices if devices is not None else jax.devices())
    if rays <= 0:
        rays = len(devices) // data
    assert data * rays == len(devices)
    return Mesh(np.asarray(devices).reshape(data, rays), ("data", "rays"))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (n, B, 8) ray tensors over the ray axis (dim 1)."""
    return NamedSharding(mesh, P(None, "rays"))


def eval_mesh() -> Optional[Mesh]:
    """The product evaluators' mesh: all local devices on the `rays` axis
    (the feature grid replicates; rays/query points are embarrassingly
    parallel, SURVEY.md §5.7), or None on a single device. The reference
    gets its eval parallelism for free from DDP (reference
    utils/base_evaluator.py:15, idist.auto_dataloader); ours comes from
    sharding each frame's ray dimension so a v5e-8 renders ~8x faster than
    one chip. BTS_EVAL_SHARD=0 disables (single-device eval)."""
    import os
    if os.environ.get("BTS_EVAL_SHARD", "1") != "1":
        return None
    if jax.device_count() <= 1:
        return None
    return make_mesh_2d(jax.devices(), data=1)
