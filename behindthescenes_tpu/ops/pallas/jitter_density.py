"""Fused stratified-jitter self-view density query.

The jittered (reference-semantics, nerf.py:103-123 sampling) self-view
depth render cannot use the deterministic shared-z table collapse: every
ray gets its own z samples, so written as jnp the pipeline materializes
two large HBM intermediates per frame —

    code  = posenc(coord)            (hw, K, 13) f32   ~410 MB
    h_dyn = code @ w_d               (hw, K, 64) bf16  ~1 GB

Measured on chip (scripts/bench_jitter_stages.py, flagship 192x640 x 64):
posenc 1.4 ms + h_dyn matmul 1.9 ms + tail 0.55 ms = ~3.9 ms of the 6.8 ms
jittered frame, almost all of it HBM traffic for tensors that are consumed
immediately.

This kernel fuses posenc -> lin_in(dynamic half) -> +h_static+bias -> relu
-> lin_out(density column) entirely in VMEM. Mosaic wants 2D vector
layouts, so everything is expressed as 2D tiles with rays on LANES:

    coordT    (K, B) f32     one sublane row per sample index
    h_staticT (H, B) bf16    per-ray static hidden, transposed
    out       (K, B) f32     pre-activation density logit

and the kernel loops k = 0..K-1 (lax.fori_loop), each iteration doing pure
2D work: build the 13-row code block [z; sin(f_i z); cos(f_i z)] for that
sample index, one (H,13)@(13,T) MXU matmul, a rectified add, and a
(1,H)@(H,T) matvec — the (hw, K, 64) tensor never exists.

Weight rows are pre-permuted by the caller so the kernel's natural
[id, sin f1..fF, cos f1..fF] order matches the PositionalEncoding layout
[id, sin f1, cos f1, sin f2, cos f2, ...] (ops/posenc.py:30-42).

Inference-only (the jittered self-view render; training uses the general
query path) — no custom VJP. Numerics mirror the jnp path's bf16 compute
(bf16 matmul inputs, f32 accumulation); parity-tested in
tests/test_pallas_jitter.py.

Wiring: BTSNet.query_selfview_density dispatches here (via
ResnetFC.call_split_jitter) when `jitter_kernel_enabled()` — on-TPU by
default, overridable with BTS_JITTER_PALLAS=0/1. On CPU the default is the
jnp path (the kernel only runs in interpret mode there).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def jitter_kernel_enabled() -> bool:
    """Whether the fused jitter-density kernel replaces the jnp path.

    BTS_JITTER_PALLAS=1/0 (or true/false, on/off, yes/no) forces it;
    unset, the default is ON for the TPU backend (measured win — see
    PERF.md kernel index) and OFF elsewhere (interpret mode is for parity
    tests only). Unrecognized values raise rather than silently inverting
    the on-TPU default.
    """
    from behindthescenes_tpu.platform import bool_env
    if os.environ.get("BTS_JITTER_PALLAS") is not None:
        return bool_env("BTS_JITTER_PALLAS", False)
    return jax.default_backend() == "tpu"


def kernel_cost(n_rays: int, k: int, hidden: int, n_freqs: int):
    """(flops, bytes) of the kernel's fused scope, counted analytically —
    XLA's cost_analysis scores a pallas custom-call at ZERO, so roofline
    accounting (bench.py, scripts/roofline.py) must add this back for any
    program that dispatches the kernel.

    Per sample: the z positional code (1 + 2*n_freqs values, ~2 flops
    each), the dynamic lin_in matmul (2 * code_dim * hidden), the
    h_static + bias add and relu (2 * hidden), and the density-column
    lin_out reduction (2 * hidden). Bytes: h_static in (bf16 — the caller
    casts it at the pallas_call, jitter_density_pallas below), f32 coord
    in, f32 logits out; weights are negligible."""
    code_dim = 1 + 2 * n_freqs
    per_sample = (2 * code_dim            # sin/cos + scale
                  + 2 * code_dim * hidden  # dynamic matmul
                  + 2 * hidden             # add + relu
                  + 2 * hidden)            # lin_out dot
    flops = n_rays * k * per_sample
    bytes_ = (2 * n_rays * hidden          # h_static (bf16 as transferred)
              + 4 * n_rays * k             # coord (f32)
              + 4 * n_rays * k)            # logits out (f32)
    return float(flops), float(bytes_)


KB = 8  # k-samples fused per MXU dot: 8*13 = 104 contraction rows <= 128,
#         so stacking 8 samples block-diagonally costs the SAME padded
#         matmul as one (the MXU pads the contraction to 128 regardless).


def _kernel(coordT_ref, hsT_ref, wdbd_ref, b_in_ref, w_out_bd_ref,
            b_out_ref, out_ref, *, n_freqs: int, freq_factor: float,
            vpu_proj: bool = False, ablate_code: bool = False):
    hs_stack = jnp.concatenate([hsT_ref[...]] * KB, axis=0) \
        .astype(jnp.float32)                            # (KB*H, T)
    wd_bd = wdbd_ref[...].astype(jnp.bfloat16)          # (KB*H, KB*13)
    b_in = b_in_ref[...].astype(jnp.float32)            # (KB*H, 1)
    w_out_bd = w_out_bd_ref[...].astype(jnp.bfloat16)   # (KB, KB*H)
    b_out = b_out_ref[...].astype(jnp.float32)          # (1, 1)
    if vpu_proj:
        h = hsT_ref.shape[0]
        # Tiled (KB*H, 1) out-weight column for the VPU projection: sum
        # the block-diagonal's rows (each column has one nonzero).
        w_out_t = jnp.sum(w_out_bd_ref[...].astype(jnp.float32),
                          axis=0).reshape(KB * h, 1)
    freqs = [float(freq_factor * 2.0 ** i) for i in range(n_freqs)]
    k_total = out_ref.shape[0]

    def body(g, carry):
        c = coordT_ref[pl.dslice(g * KB, KB), :].astype(jnp.float32)
        # (KB*13, T), k-major within each of the 13 function blocks —
        # wd_bd's contraction rows are permuted to match.
        if ablate_code:
            # Bench-only probe (scripts/bench_jitter_isolate.py): same
            # shapes/matmuls but no transcendentals — prices the VPU
            # sin/cos share of the kernel. NOT a valid density decode.
            code = jnp.concatenate([c] * (1 + 2 * len(freqs)), axis=0)
        else:
            # Octave frequency ladder (f, 2f, 4f, ...) via double-angle
            # recursion: sin(2a) = 2 sin a cos a, cos(2a) = 1 - 2 sin^2 a
            # — 2 transcendentals + ~4 VPU mul/adds per extra frequency
            # instead of 2 per frequency. Measured: the naive form spent
            # 1.17 ms of the 2.20 ms kernel in sin/cos (53%,
            # scripts/bench_jitter_isolate.py); f32 recursion error after
            # 5 doublings is ~1e-6, far below the bf16 matmul rounding
            # the code feeds (2^-8).
            s = jnp.sin(freqs[0] * c)
            co = jnp.cos(freqs[0] * c)
            sins, coss = [s], [co]
            for _ in range(len(freqs) - 1):
                s, co = 2.0 * s * co, 1.0 - 2.0 * s * s
                sins.append(s)
                coss.append(co)
            code = jnp.concatenate([c] + sins + coss, axis=0)
        hd = jax.lax.dot_general(
            wd_bd, code.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (KB*H, T)
        if vpu_proj:
            # Projection as a VPU segment-reduce fused with the relu
            # pass: drops the (KB,KB*H)x(KB*H,T) MXU dot (32 passes per
            # iteration — as many as the code matmul; see PERF.md).
            xw = jnp.maximum(hd + hs_stack + b_in, 0.0) * w_out_t
            o = jnp.concatenate(
                [jnp.sum(xw[kk * h:(kk + 1) * h, :], axis=0,
                         keepdims=True) for kk in range(KB)], axis=0)
        else:
            x = jnp.maximum(hd + hs_stack + b_in, 0.0) \
                .astype(jnp.bfloat16)
            o = jax.lax.dot_general(
                w_out_bd, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (KB, T)
        out_ref[pl.dslice(g * KB, KB), :] = o + b_out
        return carry

    jax.lax.fori_loop(0, k_total // KB, body, 0)


def jitter_density_jnp(coord, h_static, w_d, b_in, w_out_col, b_out,
                       *, n_freqs: int, freq_factor: float):
    """Reference jnp formulation (interleaved posenc layout, matching
    PositionalEncoding): materializes code and h_dyn — the baseline this
    kernel removes. coord (B, K) f32; h_static (B, H); w_d (13, H) in the
    INTERLEAVED row order; returns pre-activation logits (B, K) f32."""
    freqs = freq_factor * (2.0 ** np.arange(n_freqs))
    scaled = coord[..., None] * jnp.asarray(freqs, coord.dtype)   # (B,K,F)
    emb = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], -1) \
        .reshape(coord.shape + (2 * n_freqs,))
    code = jnp.concatenate([coord[..., None], emb], -1)           # (B,K,13)
    hd = jnp.dot(code.astype(jnp.bfloat16), w_d.astype(jnp.bfloat16))
    x = (h_static.astype(jnp.bfloat16)[:, None, :] + hd
         + b_in.astype(jnp.bfloat16))
    out = jnp.dot(jax.nn.relu(x), w_out_col.astype(jnp.bfloat16))
    return out[..., 0].astype(jnp.float32) + b_out


def interleave_to_grouped(n_freqs: int) -> np.ndarray:
    """Row permutation taking the PositionalEncoding layout
    [id, sin f1, cos f1, sin f2, cos f2, ...] to the kernel's
    [id, sin f1..fF, cos f1..fF]."""
    return np.concatenate([[0],
                           1 + 2 * np.arange(n_freqs),
                           2 + 2 * np.arange(n_freqs)]).astype(np.int32)


@functools.partial(jax.jit, static_argnames=(
    "n_freqs", "freq_factor", "block", "interpret", "vpu_proj",
    "ablate_code"))
def jitter_density_pallas(coord, h_static, w_d, b_in, w_out_col, b_out,
                          *, n_freqs: int, freq_factor: float,
                          block: int = 1024, interpret: bool = False,
                          vpu_proj: bool = False, ablate_code: bool = False):
    """Fused density logits for per-ray z codes.

    coord: (B, K) f32 normalized z code input in [-1, 1] (B rays, K samples)
    h_static: (B, H) static per-ray hidden (features + xy-code @ w_static)
    w_d: (13, H) dynamic lin_in rows in INTERLEAVED posenc order
    b_in: (H,); w_out_col: (H, 1) density column; b_out: scalar
    Returns pre-activation logits (B, K) f32 (softplus/relu applied by the
    caller, matching BTSNet.query_selfview_density).
    """
    b, k = coord.shape
    h = h_static.shape[1]
    nf2 = 2 * n_freqs + 1
    kp = -(-k // KB) * KB
    perm = np.asarray(interleave_to_grouped(n_freqs))

    # Block-diagonal weights: output block kk of KB only contracts with
    # code rows of sample kk. Contraction rows are laid out k-major within
    # each function block (matching the kernel's concatenate order).
    wd_g = w_d.astype(jnp.float32)[jnp.asarray(perm)]   # (13, H) grouped
    wd_bd = jnp.zeros((KB * h, KB * nf2), jnp.float32)
    w_out_flat = w_out_col.astype(jnp.float32).reshape(h)
    w_out_bd = jnp.zeros((KB, KB * h), jnp.float32)
    for kk in range(KB):
        wd_bd = wd_bd.at[kk * h:(kk + 1) * h,
                         np.arange(nf2) * KB + kk].set(wd_g.T)
        w_out_bd = w_out_bd.at[kk, kk * h:(kk + 1) * h].set(w_out_flat)
    b_in_t = jnp.tile(jnp.asarray(b_in).reshape(h, 1), (KB, 1))

    padded = -(-b // block) * block
    coordT = jnp.pad(coord, ((0, padded - b), (0, kp - k)),
                     constant_values=0.5).T             # (Kp, Bp)
    hsT = jnp.pad(h_static, ((0, padded - b), (0, 0))).T       # (H, Bp)
    out = pl.pallas_call(
        functools.partial(_kernel, n_freqs=n_freqs,
                          freq_factor=freq_factor, vpu_proj=vpu_proj,
                          ablate_code=ablate_code),
        grid=(padded // block,),
        in_specs=[
            pl.BlockSpec((kp, block), lambda i: (0, i)),
            pl.BlockSpec((h, block), lambda i: (0, i)),
            pl.BlockSpec((KB * h, KB * nf2), lambda i: (0, 0)),
            pl.BlockSpec((KB * h, 1), lambda i: (0, 0)),
            pl.BlockSpec((KB, KB * h), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((kp, block), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((kp, padded), jnp.float32),
        interpret=interpret,
    )(coordT, hsT.astype(jnp.bfloat16), jnp.asarray(wd_bd), b_in_t,
      jnp.asarray(w_out_bd), jnp.asarray(b_out).reshape(1, 1))
    return out[:k, :b].T                                # (B, K)
