"""Fused Pallas kernel for the self-view density query.

Fuses, per ray tile, entirely in VMEM:
  z-code positional encoding (sin/cos) -> lin_in (MXU) -> +per-ray static
  half (broadcast over samples) -> ReLU -> lin_out (reduction) -> softplus.

This removes the HBM round-trips the XLA path pays between the two matmuls
(the (HW, K, 64) hidden tensor, ~1-2 GB/frame) — the remaining traffic is
just h_static (HW,64) + coord (HW*K,1) in, sigma (HW*K,1) out.

Only the n_blocks=0 ResnetFC configuration (the shipped KITTI configs,
reference configs/exp_kitti_raw.yaml:41-44) runs through this kernel; other
shapes fall back to the jnp path. Inference-only (no VJP): training uses the
general query path.

**Measured result (kept for the record): the kernel LOSES.** 147M pts/s vs
XLA's 1.7G on chip (PERF.md finding 5): the points-as-rows layout lane-pads
the 13-wide code to 128 lanes and the one-hot MXU broadcast adds work.
OFF — parity-tested scaffold (tests/test_pallas_selfview.py); the shipped
self-view fast path is the XLA formulation in models/bts.py. See the
PERF.md kernel decision index.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rays per kernel tile. K samples per ray are laid out points-as-rows, so a
# tile processes RAY_TILE * K rows of the MLP. Sized to fit VMEM: the lane-
# padded coord/X/hidden/one-hot buffers cost ~0.3MB per 8 rays at K=64.
RAY_TILE = 32


def _kernel(hs_ref, coord_ref, wz_ref, win_bias_ref, wo_ref, bout_ref,
            sigma_ref, *, k_samples: int, num_freqs: int,
            include_input: bool, freq_factor: float):
    rk = hs_ref.shape[0] * k_samples
    coord = coord_ref[:]                           # (R*K, 1)

    # Constants must be materialized in-kernel (no captured arrays);
    # TPU iota is integer-only.
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, num_freqs), 1)
    freqs_row = freq_factor * jnp.exp2(iota.astype(jnp.float32))  # (1, F)
    scaled = coord * freqs_row                     # (R*K, F)
    parts = []
    if include_input:
        parts.append(coord)
    parts.append(jnp.sin(scaled))
    parts.append(jnp.cos(scaled))
    x = jnp.concatenate(parts, axis=-1)            # (R*K, D)

    h = jnp.dot(x, wz_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    # Broadcast each ray's static half over its K samples (rows are
    # ray-major: row p belongs to ray p // K). pltpu.repeat is tile-style,
    # so expand via a one-hot matmul on the MXU instead.
    n_rays = hs_ref.shape[0]
    row_ray = jax.lax.broadcasted_iota(jnp.int32, (rk, n_rays), 0) \
        // k_samples
    col_ray = jax.lax.broadcasted_iota(jnp.int32, (rk, n_rays), 1)
    expand = (row_ray == col_ray).astype(jnp.float32)        # (R*K, R)
    hs = jnp.dot(expand, hs_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    h = jax.nn.relu(h + hs + win_bias_ref[:])
    sig = jnp.sum(h * wo_ref[:], axis=-1, keepdims=True) + bout_ref[0, 0]
    sigma_ref[:] = jax.nn.softplus(sig)


@functools.partial(
    jax.jit,
    static_argnames=("k_samples", "num_freqs", "include_input",
                     "freq_factor", "interpret"))
def selfview_density_fused(h_static, coord, w_z, b_in, w_out, b_out,
                           k_samples: int, num_freqs: int = 6,
                           include_input: bool = True,
                           freq_factor: float = 1.5,
                           interpret: bool = False):
    """Fused density evaluation along self-view rays.

    Args:
      h_static: (HW, 64) per-ray lin_in contribution of features + x/y code.
      coord: (HW, K) normalized z-code input in [-1, 1].
      w_z: (D, 64) lin_in rows for the z-code dims
        (D = num_freqs*2 + include_input).
      b_in: (64,) lin_in bias; w_out: (64,) lin_out weights; b_out scalar.
    Returns:
      sigma (HW, K) f32 (softplus applied).
    """
    hw, d_hidden = h_static.shape
    assert hw % RAY_TILE == 0, f"HW={hw} must be divisible by {RAY_TILE}"
    num_tiles = hw // RAY_TILE

    coord_rows = coord.reshape(hw * k_samples, 1).astype(jnp.float32)
    h_static = h_static.astype(jnp.float32)
    w_z = w_z.astype(jnp.float32)
    b_in_row = b_in.reshape(1, d_hidden).astype(jnp.float32)
    w_out_row = w_out.reshape(1, d_hidden).astype(jnp.float32)
    b_out_s = jnp.asarray(b_out, dtype=jnp.float32).reshape(1, 1)

    kern = functools.partial(
        _kernel, k_samples=k_samples, num_freqs=num_freqs,
        include_input=include_input, freq_factor=freq_factor)

    sigma = pl.pallas_call(
        kern,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((RAY_TILE, d_hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_TILE * k_samples, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_z.shape[0], d_hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((RAY_TILE * k_samples, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hw * k_samples, 1), jnp.float32),
        interpret=interpret,
    )(h_static, coord_rows, w_z, b_in_row, w_out_row, b_out_s)
    return sigma.reshape(hw, k_samples)
