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


def sharded_point_query(mesh: Optional[Mesh], query_batch_size: int,
                        body):
    """Build a chunked dense point query `(pts (P, 3)) -> (P,)` that
    lax.maps `body((1, Q, 3) chunk) -> (Q,)` over padded chunks,
    sharding each chunk's point axis over the mesh's `rays` axis when a
    mesh is given (query_batch_size then counts points PER DEVICE).
    Shared by the LiDAR/3dbb occupancy evaluators' density-grid queries."""
    import jax.numpy as jnp
    qbs = query_batch_size
    point_spec = None
    if mesh is not None:
        point_spec = ray_sharding(mesh)                 # (1, Q, 3) dim 1
        qbs = qbs * mesh.shape["rays"]

    def query(pts):
        n_chunks = -(-pts.shape[0] // qbs)
        pad = n_chunks * qbs - pts.shape[0]
        pts_p = jnp.pad(pts, [(0, pad), (0, 0)])
        chunks = pts_p.reshape(n_chunks, 1, qbs, 3)

        def chunk_body(chunk):
            if point_spec is not None:
                chunk = jax.lax.with_sharding_constraint(chunk, point_spec)
            return body(chunk)

        out = jax.lax.map(chunk_body, chunks)
        return out.reshape(-1)[:pts.shape[0]]

    return query


def eval_mesh() -> Optional[Mesh]:
    """The product evaluators' mesh: all local devices on the `rays` axis
    (the feature grid replicates; rays/query points are embarrassingly
    parallel, SURVEY.md §5.7), or None on a single device. The reference
    gets its eval parallelism for free from DDP (reference
    utils/base_evaluator.py:15, idist.auto_dataloader); ours comes from
    sharding each frame's ray dimension so a v5e-8 renders ~8x faster than
    one chip. BTS_EVAL_SHARD=0 disables (single-device eval)."""
    from behindthescenes_tpu.platform import bool_env
    if not bool_env("BTS_EVAL_SHARD", True):
        return None
    if jax.device_count() <= 1:
        return None
    return make_mesh_2d(jax.devices(), data=1)
