"""Inference helpers: full-frame depth rendering, novel-view rendering, and
BEV density profiles (reference scripts/inference_setup.py:100-229).

`render_depth_selfview` is the TPU-first fast path for the headline
single-view workloads (gen_img depth maps, eval_depth keyframe renders):
rays from the encoder camera sample their own pixel's feature row densely —
no gathers — so the whole frame renders as a handful of fused matmuls.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from behindthescenes_tpu import geometry
from behindthescenes_tpu import renderer as renderer_lib
from behindthescenes_tpu.models.bts import BTSNet, FeatureGrid
from behindthescenes_tpu.ray_sampler import ImageRaySampler


def render_depth_selfview(net: BTSNet, variables, grid: FeatureGrid, key,
                          height: int, width: int,
                          cfg: renderer_lib.RendererConfig,
                          z_near: float, z_far: float, scale: int = 0,
                          as_z_depth: bool = True,
                          deterministic: bool = False):
    """Render the keyframe's expected depth via the dense self-view density
    query. Returns (depth (1, h, w), weights (1, h*w, K), z_samp (h*w, K)).

    deterministic=True (inference-only, code_mode=z): one camera-z sample
    ladder stratified at bin midpoints, shared by every ray — the z-code
    becomes a (K, 64) table and the MLP an outer sum (~2x faster query, no
    sampling noise). Distances along each (unit) ray are z_cam * |dir|;
    the expected depth in camera z is directly sum(w * z_cam).
    """
    k = cfg.n_coarse
    if deterministic and net.code_mode == "z":
        s = (jnp.arange(k, dtype=jnp.float32) + 0.5) / k
        if cfg.lindisp:
            z_cam = 1.0 / (1.0 / z_near * (1.0 - s) + 1.0 / z_far * s)
        else:
            z_cam = z_near * (1.0 - s) + z_far * s
        sigma = net.apply(variables, grid, z_cam,
                          method=BTSNet.query_selfview_density_shared_z,
                          scale=scale, out_hw=(height, width))  # (1, hw, K)
        # Per-ray sample DISTANCES scale by the ray norm: |p| = z_cam*|d|.
        k_mat = grid.f_ks[0, 0]
        xs = jnp.linspace(-1.0, 1.0, width)
        ys = jnp.linspace(-1.0, 1.0, height)
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
        dirs = jnp.stack([(gx - k_mat[0, 2]) / k_mat[0, 0],
                          (gy - k_mat[1, 2]) / k_mat[1, 1],
                          jnp.ones_like(gx)], -1)
        norms = jnp.linalg.norm(dirs, axis=-1).reshape(-1)      # (hw,)
        z_dist = z_cam[None, :] * norms[:, None]                # (hw, K)
        weights, _ = renderer_lib.weights_from_sigma(sigma[0], z_dist, cfg)
        # Expected camera-z depth directly (no distance_to_z needed).
        depth = jnp.sum(weights * z_cam[None, :], axis=-1) \
            .reshape(1, height, width)
        if not as_z_depth:
            depth = depth.reshape(1, height, width) \
                * norms.reshape(1, height, width)
        return depth, weights[None], z_dist

    rays_stub = jnp.concatenate([
        jnp.zeros((height * width, 6), dtype=jnp.float32),
        jnp.full((height * width, 1), z_near, dtype=jnp.float32),
        jnp.full((height * width, 1), z_far, dtype=jnp.float32)], axis=-1)
    z_samp = renderer_lib.sample_coarse(key, rays_stub, cfg.n_coarse,
                                        cfg.lindisp)            # (hw, K)
    sigma = net.apply(variables, grid, z_samp,
                      method=BTSNet.query_selfview_density,
                      scale=scale, out_hw=(height, width))       # (1, hw, K)
    weights, _ = renderer_lib.weights_from_sigma(sigma[0], z_samp, cfg)
    depth = jnp.sum(weights * z_samp, axis=-1).reshape(1, height, width)
    if as_z_depth:
        depth = geometry.distance_to_z(depth[None], grid.f_ks[:, :1])[0]
    return depth, weights[None], z_samp


def render_poses(net: BTSNet, variables, grid: FeatureGrid, key,
                 poses, projs, height: int, width: int,
                 cfg: renderer_lib.RendererConfig, z_near: float,
                 z_far: float, ray_chunk: int = 16384):
    """Render novel views through the general path
    (reference inference_setup.py:182-198).

    poses: (v, 4, 4) c2w; projs: (v, 3, 3). Returns dict with rgb
    (v, h, w, 3-per-view-stacked), depth (v, h, w), invalids (v, h, w).
    """
    sampler = ImageRaySampler(z_near, z_far, height=height, width=width)
    rays, _ = sampler.sample(None, None, poses[None], projs[None])

    def query_fn(xyz, coarse):
        return net.apply(variables, grid, xyz, coarse=coarse,
                         method=BTSNet.query)

    out = renderer_lib.render_rays_chunked(query_fn, rays, key, cfg,
                                           ray_chunk=ray_chunk)
    render_dict = {"coarse": out["coarse"],
                   "fine": out.get("fine", dict(out["coarse"]))}
    render_dict = sampler.reconstruct(render_dict)
    c = render_dict["coarse"]
    v = poses.shape[0]
    rgb = c["rgb"].reshape(v, height, width, -1, 3).mean(-2)
    depth = c["depth"].reshape(v, height, width)
    invalid = c["invalid"].reshape(v, height, width, -1).mean(-1)
    return {"rgb": rgb, "depth": depth, "invalid": invalid}


def render_profile(net: BTSNet, variables, grid: FeatureGrid,
                   x_range=(-9.0, 9.0), y_val: float = 0.0,
                   z_range=(21.0, 3.0), ppm: float = 10.0,
                   sigma_cutoff: float = 8.0,
                   query_batch: Optional[int] = 50000):
    """Top-down (BEV) density profile
    (reference scripts/inference_setup.py:201-229): query the field on an
    x/z grid at fixed height, cumulative-sum densities along z and
    threshold for visibility.
    Returns (profile (zn, xn) in [0,1], sigma grid (zn, xn)).
    """
    x0, x1 = x_range
    z0, z1 = z_range
    xn = int(abs(x1 - x0) * ppm)
    zn = int(abs(z0 - z1) * ppm)
    xs = jnp.linspace(x0, x1, xn)
    zs = jnp.linspace(z0, z1, zn)
    zz, xx = jnp.meshgrid(zs, xs, indexing="ij")
    pts = jnp.stack([xx, jnp.full_like(xx, y_val), zz], axis=-1)
    pts_flat = pts.reshape(1, -1, 3)

    _, _, sigma = net.apply(variables, grid, pts_flat, only_density=True,
                            method=BTSNet.query)
    sigma = sigma.reshape(zn, xn)

    # Visibility: accumulate density from the camera (z increasing towards
    # the viewer is axis 0 reversed) and fade out past the cutoff.
    acc = jnp.cumsum(sigma[::-1], axis=0)[::-1]
    profile = jnp.clip(sigma, 0.0, 1.0) * (acc < sigma_cutoff)
    return profile, sigma
