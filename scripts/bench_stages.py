"""Stage-level profiling of the general (cross-view / NVS / training) query
path on the real chip. Times each stage with the loop-inside-jit
methodology (PERF.md): N iterations per compiled program, one sync.

Usage: python scripts/bench_stages.py [P]   (default 245760 points)
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

from behindthescenes_tpu.models.bts import BTSNet
from behindthescenes_tpu import geometry

H, W = 192, 640
P = int(sys.argv[1]) if len(sys.argv) > 1 else 245760


def timeit(name, fn, *args, iters=(10, 60)):
    """Marginal per-iteration time: (T(hi) - T(lo)) / (hi - lo) cancels the
    relay's ~28ms fixed dispatch+sync cost (PERF.md methodology). The loop
    bound is traced so one compile serves both counts."""
    def looped(n, *a):
        def body(i, acc):
            out = fn(*a, salt=acc * 1e-12)
            return acc + out
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jf = jax.jit(looped)
    lo, hi = jnp.int32(iters[0]), jnp.int32(iters[1])
    float(jf(lo, *args))  # compile+warm
    float(jf(hi, *args))

    def t(n):
        t0 = time.perf_counter()
        float(jf(n, *args))
        return time.perf_counter() - t0

    t_lo = np.median([t(lo) for _ in range(3)])
    t_hi = np.median([t(hi) for _ in range(3)])
    ms = (t_hi - t_lo) / (iters[1] - iters[0]) * 1e3
    print(f"{name:38s} {ms:8.3f} ms   {P / (ms / 1e3) / 1e6:8.1f} Mpts/s")
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
    poses = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4))
    poses = poses.at[:, 1, 0, 3].set(0.54)
    projs = jnp.broadcast_to(jnp.asarray(
        [[0.6, 0, 0], [0, 1.8, 0], [0, 0, 1]], dtype=jnp.float32),
        (1, 2, 3, 3))
    variables = net.init(jax.random.PRNGKey(0), images, projs, poses,
                         jnp.zeros((1, 8, 3)))

    grid = jax.jit(lambda v, im: net.apply(
        v, im, projs, poses, ids_encoder=[0], ids_render=[0, 1],
        method=BTSNet.encode))(variables, images)

    pts = jnp.asarray(
        rng.uniform(-1, 1, (1, P, 3)) * np.array([8, 2, 1])
        + np.array([0, 0, 12.0]), dtype=jnp.float32)

    # ---- stages
    def full_query(v, g, x, salt=0.0):
        rgb, inv, sig = net.apply(v, g, x + salt, method=BTSNet.query)
        return jnp.sum(sig) + jnp.sum(rgb)

    def density_only(v, g, x, salt=0.0):
        _, _, sig = net.apply(v, g, x + salt, only_density=True,
                              method=BTSNet.query)
        return jnp.sum(sig)

    def feats_only(v, g, x, salt=0.0):
        f, inv = net.apply(v, g, x + salt, method=BTSNet.sample_features)
        return jnp.sum(f)

    def colors_only(v, g, x, salt=0.0):
        c, inv = net.apply(v, g, x + salt, method=BTSNet.sample_colors)
        return jnp.sum(c)

    def project_only(v, g, x, salt=0.0):
        xy, z, d, inv = geometry.project_points(x + salt, g.f_poses_w2c,
                                                g.f_ks)
        return jnp.sum(xy) + jnp.sum(z)

    def encoder_only(v, im, salt=0.0):
        lat = net.apply(v, im[0, :1] + salt,
                        method=lambda m, a: m.encoder(a, False))
        return jnp.sum(lat[0].astype(jnp.float32))

    from behindthescenes_tpu.models.encoder import ResnetEncoder
    trunk = ResnetEncoder(50, jnp.bfloat16)
    trunk_vars = trunk.init(jax.random.PRNGKey(1), jnp.zeros((1, H, W, 3)))

    def resnet_only(tv, im, salt=0.0):
        feats = trunk.apply(tv, (im[0, :1] + salt) * 0.5 + 0.5)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    def full_encode(v, im, salt=0.0):
        g = net.apply(v, im + salt, projs, poses, ids_encoder=[0],
                      ids_render=[0, 1], method=BTSNet.encode)
        return (jnp.sum(g.features[0].astype(jnp.float32))
                + jnp.sum(g.color_imgs_packed.astype(jnp.float32)))

    timeit("encoder (1 frame 192x640, rn50 bf16)", encoder_only, variables,
           images)
    timeit("resnet trunk only (no decoder)", resnet_only, trunk_vars, images)
    timeit("full encode (CNN + packing)", full_encode, variables, images)

    # ---- self-view (depth headline) stages
    from behindthescenes_tpu import renderer as renderer_lib
    from behindthescenes_tpu.inference import render_depth_selfview
    rcfg = renderer_lib.RendererConfig(n_coarse=64, n_fine=0, lindisp=True,
                                       hard_alpha_cap=True)
    K = 64
    s = (jnp.arange(K, dtype=jnp.float32) + 0.5) / K
    z_cam = 1.0 / (1.0 / 3.0 * (1.0 - s) + 1.0 / 80.0 * s)

    def sv_density(v, g, zc, salt=0.0):
        sig = net.apply(v, g, zc + salt, scale=0, out_hw=(H, W),
                        method=BTSNet.query_selfview_density_shared_z)
        return jnp.sum(sig.astype(jnp.float32))

    def sv_composite(v, g, zc, sig, zd, salt=0.0):
        wts, _ = renderer_lib.weights_from_sigma(sig + salt, zd, rcfg)
        return jnp.sum(wts * (zc + salt)[None, :])

    def sv_full(v, g, zc, salt=0.0):
        depth, _, _ = render_depth_selfview(
            net, variables, g, jax.random.PRNGKey(0), H, W, rcfg,
            3.0 + salt * 1e-12, 80.0, deterministic=True)
        return jnp.sum(depth)

    sig0 = jax.jit(lambda v, g, zc: net.apply(
        v, g, zc, scale=0, out_hw=(H, W),
        method=BTSNet.query_selfview_density_shared_z))(variables, grid,
                                                        z_cam)[0]
    zd0 = jnp.broadcast_to(z_cam[None, :], (H * W, K)) * 1.02
    timeit("selfview shared-z density (7.9M q)", sv_density, variables,
           grid, z_cam)
    timeit("weights_from_sigma + depth reduce", sv_composite, variables,
           grid, z_cam, sig0, zd0)
    timeit("render_depth_selfview deterministic", sv_full, variables, grid,
           z_cam)
    timeit("project_points", project_only, variables, grid, pts)
    timeit("sample_features (packed bf16)", feats_only, variables, grid, pts)
    timeit("sample_colors (2 views packed)", colors_only, variables, grid,
           pts)
    timeit("density_only query", density_only, variables, grid, pts)
    timeit("FULL query (feat+code+mlp+colors)", full_query, variables, grid,
           pts)


if __name__ == "__main__":
    main()
