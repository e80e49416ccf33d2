"""Sweep-mode NVS frame benchmark (models/sweep.py) vs the general path.

Times one full 192x640 novel-view frame on the flagship model through
`render_frame_sweep` — deterministic shared z-ladder, per-plane warp-lattice
feature fetch + separable MXU upsample, density decode, triangular-matmul
composite, top-M color fetch — for a grid of (warp_scale, mlp_at_warp,
color_mode, n_coarse) against the general gather path's time
(scripts/bench_nvs.py). Marginal timing per bench.py.

Usage: python scripts/bench_sweep.py [--quick]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from behindthescenes_tpu.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from bench import H, W, N_COARSE, flagship_setup, marginal_time


def build(net, variables, grid, novel, proj, cfg, **sweep_kw):
    from behindthescenes_tpu.models.sweep import render_frame_sweep

    def frame(v, g, pose, n):
        def body(i, acc):
            out = render_frame_sweep(
                net, v, g, pose.at[0, 3].add(acc * 1e-12), proj, (H, W),
                cfg, **sweep_kw)
            c = out["coarse"]
            return (acc + jnp.sum(c["rgb"].astype(jnp.float32))
                    + jnp.sum(c["depth"]))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    return jax.jit(frame), (variables, grid, novel)


def bench_topk():
    """Standalone cost of the top-M weight selection (lax.top_k over
    (HW, K)) — isolates the color pass's candidate bottleneck."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.random((H * W, N_COARSE)), jnp.float32)

    def f(w, n):
        def body(i, acc):
            wv, wi = jax.lax.top_k(w + acc * 1e-12, 8)
            return acc + jnp.sum(wv) + jnp.sum(wi.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t = marginal_time(jax.jit(f), (w,), 2, 22)
    print(f"top_k (122880,64)->8           : {t * 1e3:7.2f} ms", flush=True)


def isolate():
    """Decompose the sweep frame: density-only vs color modes, and the
    planes_per_step grid — run after a full-frame number looks off."""
    from behindthescenes_tpu import renderer as renderer_lib
    from behindthescenes_tpu.models.bts import BTSNet

    net, variables, images, poses, projs = flagship_setup()
    grid = jax.jit(lambda v, im: net.apply(
        v, im, projs, poses, ids_encoder=[0], ids_render=[0],
        method=BTSNet.encode))(variables, images)
    novel = jnp.eye(4).at[0, 3].set(0.25).at[1, 3].set(-0.05)
    proj = projs[0, 0]
    cfg = renderer_lib.RendererConfig(n_coarse=N_COARSE, lindisp=True,
                                      hard_alpha_cap=True)

    bench_topk()
    variants = [
        ("density-only mlpwarp pps16", dict(color_mode="none",
                                            warp_scale=1.0,
                                            mlp_at_warp=True,
                                            planes_per_step=16)),
        ("density-only mlpwarp pps8", dict(color_mode="none",
                                           warp_scale=1.0, mlp_at_warp=True,
                                           planes_per_step=8)),
        ("density-only mlpwarp pps32", dict(color_mode="none",
                                            warp_scale=1.0,
                                            mlp_at_warp=True,
                                            planes_per_step=32)),
        ("density-only fullmlp pps8", dict(color_mode="none",
                                           warp_scale=1.0,
                                           mlp_at_warp=False,
                                           planes_per_step=8)),
        ("full topm8 pps16", dict(color_mode="topm", warp_scale=1.0,
                                  mlp_at_warp=True, planes_per_step=16)),
        ("full expected pps16", dict(color_mode="expected", warp_scale=1.0,
                                     mlp_at_warp=True, planes_per_step=16)),
        ("full exact-col pps16", dict(color_mode="exact", warp_scale=1.0,
                                      mlp_at_warp=True, planes_per_step=16)),
    ]
    for tag, kw in variants:
        fn, args = build(net, variables, grid, novel, proj, cfg, **kw)
        t = marginal_time(fn, args, 2, 12)
        print(f"sweep K=64 {tag:28s}: {t * 1e3:7.2f} ms = "
              f"{H * W / t / 1e6:6.2f} M rays/s", flush=True)


def warp_grid():
    """The warp-lattice resolution grid. The flagship monodepth2 encoder's
    scale-0 feature map is at FULL render resolution (192x640) — so
    warp_scale=1.0 is an identity lattice (no gather reduction at all;
    measured at general-path-minus-one-view speed) and the actual
    structural win starts at 0.5."""
    from behindthescenes_tpu import renderer as renderer_lib
    from behindthescenes_tpu.models.bts import BTSNet

    net, variables, images, poses, projs = flagship_setup()
    print("feature map:", tuple(jax.eval_shape(
        lambda v, im: net.apply(v, im, projs, poses, ids_encoder=[0],
                                ids_render=[0], method=BTSNet.encode),
        variables, images).features[0].shape), flush=True)
    grid = jax.jit(lambda v, im: net.apply(
        v, im, projs, poses, ids_encoder=[0], ids_render=[0],
        method=BTSNet.encode))(variables, images)
    novel = jnp.eye(4).at[0, 3].set(0.25).at[1, 3].set(-0.05)
    proj = projs[0, 0]
    cfg = renderer_lib.RendererConfig(n_coarse=N_COARSE, lindisp=True,
                                      hard_alpha_cap=True)
    variants = [
        ("w0.5 mlpwarp topm8 pps16", dict(warp_scale=0.5, mlp_at_warp=True,
                                          color_mode="topm",
                                          planes_per_step=16)),
        ("w0.5 mlpwarp topm8 pps8", dict(warp_scale=0.5, mlp_at_warp=True,
                                         color_mode="topm",
                                         planes_per_step=8)),
        ("w0.5 mlpwarp topm8 pps32", dict(warp_scale=0.5, mlp_at_warp=True,
                                          color_mode="topm",
                                          planes_per_step=32)),
        ("w0.5 mlpwarp none pps16", dict(warp_scale=0.5, mlp_at_warp=True,
                                         color_mode="none",
                                         planes_per_step=16)),
        ("w0.25 mlpwarp topm8 pps16", dict(warp_scale=0.25,
                                           mlp_at_warp=True,
                                           color_mode="topm",
                                           planes_per_step=16)),
        ("w0.5 fullmlp topm8 pps8", dict(warp_scale=0.5, mlp_at_warp=False,
                                         color_mode="topm",
                                         planes_per_step=8)),
    ]
    for tag, kw in variants:
        fn, args = build(net, variables, grid, novel, proj, cfg, **kw)
        t = marginal_time(fn, args, 2, 12)
        print(f"sweep K=64 {tag:28s}: {t * 1e3:7.2f} ms = "
              f"{H * W / t / 1e6:6.2f} M rays/s", flush=True)


def main(quick=False):
    from behindthescenes_tpu import renderer as renderer_lib
    from behindthescenes_tpu.models.bts import BTSNet

    net, variables, images, poses, projs = flagship_setup()
    grid = jax.jit(lambda v, im: net.apply(
        v, im, projs, poses, ids_encoder=[0], ids_render=[0],
        method=BTSNet.encode))(variables, images)
    novel = jnp.eye(4).at[0, 3].set(0.25).at[1, 3].set(-0.05)
    proj = projs[0, 0]

    variants = [
        ("warp1.0 mlpwarp topm8", dict(warp_scale=1.0, mlp_at_warp=True,
                                       color_mode="topm")),
        ("warp1.0 fullmlp topm8", dict(warp_scale=1.0, mlp_at_warp=False,
                                       color_mode="topm")),
        ("warp1.0 mlpwarp exact-col", dict(warp_scale=1.0, mlp_at_warp=True,
                                           color_mode="exact")),
        ("warp0.5 mlpwarp topm8", dict(warp_scale=0.5, mlp_at_warp=True,
                                       color_mode="topm")),
        ("exact-fetch fullmlp topm8", dict(warp_scale=None,
                                           color_mode="topm")),
    ]
    if quick:
        variants = variants[:1]

    ks = [N_COARSE] if quick else [N_COARSE, 32]
    for n_coarse in ks:
        cfg = renderer_lib.RendererConfig(n_coarse=n_coarse, lindisp=True,
                                          hard_alpha_cap=True)
        for tag, kw in variants:
            fn, args = build(net, variables, grid, novel, proj, cfg, **kw)
            t = marginal_time(fn, args, 2, 12)
            print(f"sweep K={n_coarse:2d} {tag:28s}: {t * 1e3:7.2f} ms = "
                  f"{H * W / t / 1e6:6.2f} M rays/s", flush=True)


if __name__ == "__main__":
    if "--isolate" in sys.argv:
        isolate()
    elif "--warp" in sys.argv:
        warp_grid()
    else:
        main(quick="--quick" in sys.argv)
