"""Stage-level split of the STRATIFIED-JITTER self-view depth render — the
reference-semantics co-headline (PERF.md). Finds where the gap vs the
deterministic shared-z mode (6.80 vs 3.18 ms/frame on chip) actually goes:
RNG, inv-z coord transform, z positional code, the h_dyn matmul, the
rectified-tail reduce, or the per-ray composite.

Probes are cumulative prefixes salted on z_samp (the SMALL operand, PERF.md
methodology) with marginal timing; the encode/h_static halves hoist out of
the loop identically for every prefix, so differences isolate the
per-sample dynamic stages.

Usage: python scripts/bench_jitter_stages.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from behindthescenes_tpu.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from behindthescenes_tpu import renderer as renderer_lib
from behindthescenes_tpu.models.bts import BTSNet
from behindthescenes_tpu.inference import render_depth_selfview

H = int(os.environ.get("BTS_BENCH_H", 192))
W = int(os.environ.get("BTS_BENCH_W", 640))
K = 64
ITERS = (2, 4) if os.environ.get("BTS_BENCH_SMOKE") else (8, 48)


def timeit(name, fn, *args, iters=ITERS):
    def looped(n, *a):
        def body(i, acc):
            return acc + fn(*a, salt=acc * 1e-12)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jf = jax.jit(looped)
    lo, hi = jnp.int32(iters[0]), jnp.int32(iters[1])
    float(jf(lo, *args))
    float(jf(hi, *args))

    def t(n):
        t0 = time.perf_counter()
        float(jf(n, *args))
        return time.perf_counter() - t0

    t_lo = np.median([t(lo) for _ in range(3)])
    t_hi = np.median([t(hi) for _ in range(3)])
    ms = (t_hi - t_lo) / (iters[1] - iters[0]) * 1e3
    print(f"{name:44s} {ms:8.3f} ms")
    return ms


def main():
    model_conf = {
        "z_near": 3.0, "z_far": 80.0, "inv_z": True, "code_mode": "z",
        "learn_empty": False,
        "code": {"num_freqs": 6, "freq_factor": 1.5, "include_input": True},
        "encoder": {"type": "monodepth2", "resnet_layers": 50,
                    "num_ch_dec": [32, 32, 64, 128, 256], "d_out": 64,
                    "scales": [0]},
        "mlp_coarse": {"type": "resnet", "n_blocks": 0, "d_hidden": 64},
        "mlp_fine": {"type": "empty"},
    }
    net = BTSNet.from_conf(model_conf, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 2, H, W, 3)),
                         dtype=jnp.float32)
    poses = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)).at[:, 1, 0, 3].set(0.54)
    projs = jnp.broadcast_to(jnp.asarray(
        [[0.6, 0, 0], [0, 1.8, 0], [0, 0, 1]], dtype=jnp.float32),
        (1, 2, 3, 3))
    variables = net.init(jax.random.PRNGKey(0), images, projs, poses,
                         jnp.zeros((1, 8, 3)))
    grid = jax.jit(lambda v, im: net.apply(
        v, im, projs, poses, ids_encoder=[0], ids_render=[0, 1],
        method=BTSNet.encode))(variables, images)

    rcfg = renderer_lib.RendererConfig(n_coarse=K, n_fine=0, lindisp=True,
                                       hard_alpha_cap=True)
    rays_stub = jnp.concatenate([
        jnp.zeros((H * W, 6), jnp.float32),
        jnp.full((H * W, 1), 3.0), jnp.full((H * W, 1), 80.0)], -1)
    key = jax.random.PRNGKey(1)
    z0 = renderer_lib.sample_coarse(key, rays_stub, K, True)    # (hw, K)

    mlp_params = variables["params"]["mlp_coarse"]
    w_in = mlp_params["lin_in"]["kernel"]          # (103, 64)
    b_in = mlp_params["lin_in"]["bias"]
    w_out = mlp_params["lin_out"]["kernel"]        # (64, 4)
    b_out = mlp_params["lin_out"]["bias"]
    from behindthescenes_tpu.ops.posenc import PositionalEncoding
    pe = PositionalEncoding.from_conf(model_conf["code"], d_in=3)
    rows_dyn = 64 + np.asarray(pe.subset_rows((2,)))
    w_d = w_in[jnp.asarray(rows_dyn)]              # (13, 64)

    # Static per-ray hidden (hoists out of the timing loop in EVERY probe —
    # mirrors the deterministic path where it is also loop-invariant).
    xs = jnp.linspace(-1.0, 1.0, W)
    ys = jnp.linspace(-1.0, 1.0, H)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    xy = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)
    from behindthescenes_tpu.ops.grid_sample import resample_uniform_lattice
    feats = resample_uniform_lattice(grid.features[0][0, 0], (H, W)) \
        .reshape(H * W, -1)
    code_xy = pe.subset((0, 1))(xy)
    rows_static = np.concatenate([np.arange(64),
                                  64 + pe.subset_rows((0, 1))])
    w_s = w_in[jnp.asarray(rows_static)]
    h_static = jnp.dot(jnp.concatenate([feats, code_xy], -1)
                       .astype(jnp.bfloat16), w_s.astype(jnp.bfloat16))

    k_mat = grid.f_ks[0, 0]
    dirs = jnp.stack([(xy[:, 0] - k_mat[0, 2]) / k_mat[0, 0],
                      (xy[:, 1] - k_mat[1, 2]) / k_mat[1, 1],
                      jnp.ones_like(xy[:, 0])], -1)
    inv_norm = 1.0 / jnp.linalg.norm(dirs, axis=-1)

    def coord_of(z_samp):
        z_cam = z_samp * inv_norm[:, None]
        c = ((1.0 / jnp.maximum(z_cam, 1e-6) - 1.0 / 80.0)
             / (1.0 / 3.0 - 1.0 / 80.0))
        return 2.0 * c - 1.0

    # ---- cumulative prefixes (salt z) ----
    def p_rng(k2, salt=0.0):
        z = renderer_lib.sample_coarse(
            jax.random.fold_in(k2, jnp.int32(salt)), rays_stub, K, True)
        return jnp.sum(z) * 1e-9

    def p_coord(z, salt=0.0):
        return jnp.sum(coord_of(z + salt)) * 1e-9

    def p_code(z, salt=0.0):
        code = pe.subset((2,))(coord_of(z + salt)[..., None])   # (hw,K,13)
        return jnp.sum(code.astype(jnp.float32)) * 1e-9

    def p_hdyn(z, salt=0.0):
        code = pe.subset((2,))(coord_of(z + salt)[..., None])
        hd = jnp.dot(code.astype(jnp.bfloat16), w_d.astype(jnp.bfloat16))
        return jnp.sum(hd.astype(jnp.float32)) * 1e-9

    def p_tail(hs, z, salt=0.0):
        code = pe.subset((2,))(coord_of(z + salt)[..., None])
        hd = jnp.dot(code.astype(jnp.bfloat16), w_d.astype(jnp.bfloat16))
        x = hs[:, None, :] + hd + b_in.astype(jnp.bfloat16)
        out = jnp.dot(jax.nn.relu(x), w_out.astype(jnp.bfloat16)) \
            + b_out.astype(jnp.bfloat16)
        sig = jax.nn.softplus(out[..., 0].astype(jnp.float32))
        return jnp.sum(sig) * 1e-9

    def p_tail_slice(hs, z, salt=0.0):
        # w_out sliced to the density column only (the depth render uses
        # just out[..., 0]) — probes whether the 4-wide lin_out costs.
        code = pe.subset((2,))(coord_of(z + salt)[..., None])
        hd = jnp.dot(code.astype(jnp.bfloat16), w_d.astype(jnp.bfloat16))
        x = hs[:, None, :] + hd + b_in.astype(jnp.bfloat16)
        out = jnp.dot(jax.nn.relu(x), w_out[:, :1].astype(jnp.bfloat16))
        sig = jax.nn.softplus(out[..., 0].astype(jnp.float32) + b_out[0])
        return jnp.sum(sig) * 1e-9

    def p_full_query(z, salt=0.0):
        sig = net.apply(variables, grid, z + salt, scale=0, out_hw=(H, W),
                        method=BTSNet.query_selfview_density)
        return jnp.sum(sig) * 1e-9

    def p_full_render(z, salt=0.0):
        d, _, _ = render_depth_selfview(
            net, variables, grid, jax.random.fold_in(key, jnp.int32(salt)),
            H, W, rcfg, 3.0, 80.0, deterministic=False)
        return jnp.sum(d) * 1e-9

    def p_det_render(z, salt=0.0):
        d, _, _ = render_depth_selfview(
            net, variables, grid, key,
            H, W, rcfg, 3.0 + salt * 1e-12, 80.0, deterministic=True)
        return jnp.sum(d) * 1e-9

    from behindthescenes_tpu.ops.pallas.jitter_density import (
        jitter_density_jnp, jitter_density_pallas)
    w_out_col = w_out[:, :1]

    def p_kernel(hs, z, salt=0.0):
        logits = jitter_density_pallas(
            coord_of(z + salt), hs, w_d, b_in, w_out_col, b_out[0],
            n_freqs=6, freq_factor=1.5,
            block=int(os.environ.get("BTS_JITTER_BLOCK", 1024)),
            vpu_proj=os.environ.get("BTS_JITTER_VPU_PROJ") == "1",
            interpret=jax.default_backend() != "tpu")
        return jnp.sum(jax.nn.softplus(logits)) * 1e-9

    def p_kernel_ref(hs, z, salt=0.0):
        logits = jitter_density_jnp(
            coord_of(z + salt), hs, w_d, b_in, w_out_col, b_out[0],
            n_freqs=6, freq_factor=1.5)
        return jnp.sum(jax.nn.softplus(logits)) * 1e-9

    if os.environ.get("BTS_BENCH_KERNEL_ONLY"):
        timeit("jnp posenc+hdyn+tail (kernel's scope)", p_kernel_ref,
               h_static.astype(jnp.float32), z0)
        timeit("FUSED PALLAS jitter density", p_kernel,
               h_static.astype(jnp.float32), z0)
        # On-chip parity at the real shape.
        a = jitter_density_pallas(coord_of(z0), h_static.astype(jnp.float32),
                                  w_d, b_in, w_out_col, b_out[0],
                                  n_freqs=6, freq_factor=1.5,
                                  interpret=jax.default_backend() != "tpu")
        b = jitter_density_jnp(coord_of(z0), h_static.astype(jnp.float32),
                               w_d, b_in, w_out_col, b_out[0],
                               n_freqs=6, freq_factor=1.5)
        dev = jnp.max(jnp.abs(a - b))
        print(f"max |pallas - jnp| logit deviation: {float(dev):.2e}")
        return

    timeit("rng sample_coarse (hw,K)", p_rng, key)
    timeit("+ coord transform (inv-z)", p_coord, z0)
    timeit("+ z posenc code (hw,K,13)", p_code, z0)
    timeit("+ h_dyn matmul (hw,K,64)", p_hdyn, z0)
    timeit("+ rectified tail -> sigma", p_tail, h_static, z0)
    timeit("  tail w/ w_out sliced to density col", p_tail_slice,
           h_static, z0)
    timeit("query_selfview_density (module)", p_full_query, z0)
    timeit("FULL jittered render (minus encode)", p_full_render, z0)
    timeit("FULL deterministic render (ref point)", p_det_render, z0)


if __name__ == "__main__":
    main()
