"""Fused shared-z MLP tail: sigma[i, k] = relu(hs[i] + hd[k]) @ w + b.

This is the inner loop of deterministic self-view depth inference
(models/bts.py:query_selfview_density_shared_z → mlp.call_split_shared):
a per-ray static hidden vector hs (B, H) plus a per-sample hidden table
hd (K, H), rectified, projected to a scalar. Written as plain jnp, XLA
materializes the (B, K, H) rectified tensor in HBM; this kernel keeps
everything in VMEM-resident 2D tiles.

Mosaic wants 2D vector shapes (a 3D broadcast `hs[:, None, :]` fails
layout inference), so the contraction is reformulated as an outer sum
over the H feature dim:

    out[i, k] = sum_j w[j] * relu(hs[i, j] + hd[k, j])

Each j term is a rank-1 broadcast (T, 1) + (1, K) — pure 2D VPU work,
unrolled over the (static, small) H.

Inference-only: no custom VJP (training never uses the shared-z path).

**Measured result (kept for the record): the kernel LOSES.** XLA fuses the
jnp formulation onto the MXU at 0.67 ms per 7.9M queries (it does NOT
materialize the (B, K, H) tensor — that hypothesis was wrong), while this
outer-sum kernel is pure VPU broadcast work (~64 passes over (T, K)
tiles) and costs ~3.3 ms: +2.7 ms on the depth frame. Mosaic's 2D layout
constraint forces the H-dim unroll that keeps the MXU idle. Consistent
with PERF.md finding 5: on this op class XLA's fusion is already at the
hardware envelope. OFF by default; set BTS_SHARED_Z_PALLAS=1 to run it
(parity-tested in tests/test_pallas_shared_z.py).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(hs_ref, hdt_ref, w_ref, b_ref, out_ref):
    hs = hs_ref[...].astype(jnp.float32)               # (T, H)
    hdt = hdt_ref[...].astype(jnp.float32)             # (H, K)
    w = w_ref[...].astype(jnp.float32)                 # (1, H)
    h = hs.shape[1]
    acc = jnp.zeros(out_ref.shape, jnp.float32)        # (T, K)
    for j in range(h):                                 # static unroll
        x = jnp.maximum(hs[:, j][:, None] + hdt[j, :][None, :], 0.0)
        acc = acc + w[0, j] * x
    out_ref[...] = acc + b_ref[0, 0]


def shared_z_tail_jnp(hs, hd, w_out, b_out):
    """Reference jnp formulation (also the non-TPU / general-D fallback)."""
    x = jnp.maximum(hs[:, None, :] + hd[None, :, :], 0.0)
    return jnp.einsum("bkh,hd->bkd", x.astype(jnp.float32),
                      w_out.astype(jnp.float32),
                      precision="highest") + b_out.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _tail_pallas(hs, hd, w_out, b_out, *, block, interpret):
    b, h = hs.shape
    k = hd.shape[0]
    padded = -(-b // block) * block
    if padded != b:
        hs = jnp.pad(hs, ((0, padded - b), (0, 0)))
    out = pl.pallas_call(
        _kernel,
        grid=(padded // block,),
        in_specs=[
            pl.BlockSpec((block, h), lambda i: (i, 0)),
            pl.BlockSpec((h, k), lambda i: (0, 0)),
            pl.BlockSpec((1, h), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((padded, k), jnp.float32),
        interpret=interpret,
    )(hs, hd.T, w_out.reshape(1, h), b_out.reshape(1, 1))
    return out[:b, :, None]


def shared_z_tail(hs: jnp.ndarray, hd: jnp.ndarray, w_out: jnp.ndarray,
                  b_out: jnp.ndarray, *, block: int = 512,
                  interpret: bool | None = None) -> jnp.ndarray:
    """relu(hs[:, None] + hd[None]) @ w_out + b_out.

    hs: (B, H); hd: (K, H); w_out: (H, D); b_out: (D,) -> (B, K, D) f32.
    Uses the fused Pallas kernel for D == 1 (the density decode); general
    D falls back to the jnp formulation.
    """
    from behindthescenes_tpu.platform import bool_env
    if w_out.shape[1] != 1 or not bool_env("BTS_SHARED_Z_PALLAS", False):
        return shared_z_tail_jnp(hs, hd, w_out, b_out)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _tail_pallas(hs, hd, w_out, b_out, block=block,
                        interpret=interpret)
