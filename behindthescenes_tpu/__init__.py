"""behindthescenes_tpu — a TPU-native (JAX/XLA/Pallas) framework for single-view
density-field reconstruction, with the capability surface of the CVPR'23
"Behind the Scenes" (BTS) reference implementation.

Design stance (NOT a port):
  * Functional core: pure functions over pytrees; explicit PRNG threading.
  * Flax modules for the CNN encoder; tiny field MLP evaluated inside a fused
    Pallas ray-march kernel on the hot path (with an XLA-fused jnp reference).
  * Parallelism via `jax.sharding.Mesh` + NamedSharding: rays and batches shard
    over the `data` axis; gradients/metrics reduce with compiled psums.
  * Static shapes everywhere; no data-dependent Python control flow under jit.
"""

__version__ = "0.1.0"
