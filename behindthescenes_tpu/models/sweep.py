"""Sweep-mode cross-view frame rendering (TPU-first serving path).

The general cross-view query (reference models/bts/model/models_bts.py:
138-264 → our models/bts.py `BTSNet.query`) fetches features and colors
with per-sample random row gathers — measured at the TPU gather envelope
(~2 ns/row, PERF.md findings 3b/4), which puts a full 192×640×64-sample
novel-view frame at ~159 ms on one v5e with the MXU <1% busy.

This module replaces the per-sample gathers with DENSE work for full-frame
novel-view serving, exploiting one structural fact: at serving time the
z-ladder is shared by every ray (deterministic bin midpoints — the same
move as the shipped deterministic self-view depth path, PERF.md finding 1),
so for each sample index k the fetch positions

    x_src(pixel, k) = project(o + z_k · d(pixel))

form a smooth 2-D warp of the novel view's pixel lattice (a homography-
pencil slice for planar sweeps; a "sphere sweep" here because d is unit-
normalized — exactly the reference's distance-along-ray convention).
Per plane k the pipeline is:

  1. fetch feature values on a coarse WARP LATTICE — gathers drop from
     rays×K to warp_texels×K. NB the monodepth2 scale-0 feature map is at
     FULL input resolution (PERF.md finding 19), so `warp_scale` is
     relative to RENDER resolution in practice: 1.0 is an identity
     lattice (no reduction — measured at general-path-minus-one-view
     speed) and the structural win starts at 0.5 (4× fewer rows,
     28.4 ms/frame) / 0.25 (16×, 10.2 ms);
  2. interpolate the warped plane to render resolution with the separable
     banded-matmul lattice resample (PERF.md finding 12) — dense MXU work
     instead of random access;
  3. compute projections, invalid masks, and the positional code EXACTLY
     per (ray, sample) — elementwise VPU math, so only the fetched feature
     VALUES carry the warp approximation (two chained bilinears instead of
     one; the feature map is at half render resolution anyway, so adjacent
     rays already share texels);
  4. decode density with the field MLP and composite with the triangular-
     matmul transmittance (finding 11).

Colors composite in a second pass from the coarse pass's weights without
materializing (rays, K, 3) sample colors; three measured modes:
  * "exact": per-sample packed-row gathers (reference-exact values);
  * "topm":  fetch only the M highest-weight samples per ray (compositing
    weights concentrate at the surface), renormalized so the dropped tail
    mass does not darken the pixel;
  * "expected": one fetch per ray at the weight-averaged source position
    (exact wherever the weight distribution is unimodal and the image
    locally linear; cheapest).

Scope: n=1 frames, single encoder view/group and single render view (the
NVS serving workload: reference models/bts/evaluator_nvs.py renders every
frame from the frame-0 encoding). The TRAINING path keeps the general
gather query — stratified jitter breaks the shared-ladder structure.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from behindthescenes_tpu import geometry
from behindthescenes_tpu import renderer as renderer_lib
from behindthescenes_tpu.models.bts import EPS, BTSNet, FeatureGrid
from behindthescenes_tpu.ops.grid_sample import (grid_sample_2d,
                                                 grid_sample_2d_packed,
                                                 grid_sample_2d_xpair,
                                                 pack_corners,
                                                 resample_uniform_lattice)


def sweep_z_ladder(n_samples: int, z_near, z_far, lindisp: bool,
                   dtype=jnp.float32) -> jnp.ndarray:
    """Deterministic coarse ladder: stratified-bin midpoints, shared by all
    rays (the zero-jitter limit of renderer.sample_coarse; identical to the
    deterministic self-view ladder, inference.py)."""
    s = (jnp.arange(n_samples, dtype=dtype) + 0.5) / n_samples
    if lindisp:
        return 1.0 / (1.0 / z_near * (1.0 - s) + 1.0 / z_far * s)
    return z_near * (1.0 - s) + z_far * s


def _normalize_coord(net: BTSNet, coord):
    if net.inv_z:
        coord = ((1.0 / jnp.maximum(coord, EPS) - 1.0 / net.z_far)
                 / (1.0 / net.z_near - 1.0 / net.z_far))
    else:
        coord = (coord - net.z_near) / (net.z_far - net.z_near)
    return 2.0 * coord - 1.0


def _project_single(xyz, pose_w2c, k_mat):
    """project_points for one view without the (n, v) batch dims.

    xyz: (P, 3) -> xy (P, 2), z (P, 1), distance (P, 1), invalid (P, 1)."""
    xy, z, dist, invalid = geometry.project_points(
        xyz[None], pose_w2c[None, None], k_mat[None, None], eps=EPS)
    return xy[0, 0], z[0, 0], dist[0, 0], invalid[0, 0]


def _fetch_features(grid: FeatureGrid, xy, scale: int):
    """Bilinear feature fetch at NDC coords using the packed fast path when
    available (mirrors BTSNet.sample_features' dispatch)."""
    fmap = grid.features[scale][0, 0]
    if grid.features_packed is not None:
        packed = grid.features_packed[scale][0, 0]
        c_l = fmap.shape[-1]
        if packed.shape[-1] == 2 * c_l:
            return grid_sample_2d_xpair(packed, xy)
        return grid_sample_2d_packed(packed, xy)
    return grid_sample_2d(fmap, xy, align_corners=False,
                          padding_mode="border")


def _fetch_colors(grid: FeatureGrid, xy):
    if grid.color_imgs_packed is not None:
        return grid_sample_2d_packed(grid.color_imgs_packed[0, 0], xy)
    return grid_sample_2d_packed(pack_corners(grid.color_imgs[0, 0]), xy)


def _resample_batched(x, out_hw):
    """Batched align-corners lattice resample: (P, h, w, C) -> (P, oh, ow,
    C) via the channel axis of one separable resample (planes fold into
    channels, so P planes cost ONE pair of banded matmuls)."""
    p, h, w, c = x.shape
    y = jnp.moveaxis(x, 0, -2).reshape(h, w, p * c)
    y = resample_uniform_lattice(y, out_hw, align_corners=True)
    oh, ow = out_hw
    return jnp.moveaxis(y.reshape(oh, ow, p, c), -2, 0)


def _block_divisor(k: int, p: int) -> int:
    p = max(1, min(p, k))
    while k % p:
        p -= 1
    return p


def sweep_block_density(net: BTSNet, grid: FeatureGrid, origin, dirs_full,
                        z_blk, full_hw, dirs_warp=None, warp_hw=None,
                        mlp_at_warp: bool = False, coarse: bool = True,
                        scale: int = 0):
    """Density logits for a BLOCK of P planes, vectorized (module-context
    method; the scan over blocks lives in `query_sweep_density`).

    Batching planes matters on TPU: per-plane ops at warp-lattice size sit
    under a ~1.4 ms fixed per-dispatch floor (measured — a 64-iteration
    scan of single planes costs ~90 ms regardless of gather count), while
    a block's gathers/matmuls run at the measured-efficient sizes
    (PERF.md findings 2/3b).

    z_blk: (P,). Returns (logits (P, HW), invalid (P, HW) bool)."""
    h, w = full_hw
    hw = h * w
    p = z_blk.shape[0]
    use_warp = dirs_warp is not None
    mlp = net.mlp_coarse if (coarse or net.mlp_fine is None) else net.mlp_fine
    pose_f = grid.f_poses_w2c[0, 0]
    k_f = grid.f_ks[0, 0]
    c_l = grid.features[scale].shape[-1]

    pts_full = (origin[None, None]
                + z_blk[:, None, None] * dirs_full[None])      # (P, HW, 3)
    xy_f, z_f, dist_f, inv_f = _project_single(
        pts_full.reshape(p * hw, 3), pose_f, k_f)

    if use_warp:
        wh, ww = warp_hw
        whw = dirs_warp.shape[0]
        pts_w = (origin[None, None]
                 + z_blk[:, None, None] * dirs_warp[None]).reshape(-1, 3)
        xy_w, z_w, dist_w, inv_w = _project_single(pts_w, pose_f, k_f)
        f_w = _fetch_features(grid, xy_w, scale)               # (P*whw, C)
        if net.learn_empty:
            empty = jnp.broadcast_to(
                net.empty_feature.astype(f_w.dtype), f_w.shape)
            f_w = jnp.where(inv_w, empty, f_w)
        if mlp_at_warp:
            coord_w = z_w if net.code_mode == "z" else dist_w
            coord_w = _normalize_coord(net, coord_w)
            code_w = net.code_xyz(jnp.concatenate([xy_w, coord_w], axis=-1))
            mlp_in = jnp.concatenate([f_w, code_w.astype(f_w.dtype)],
                                     axis=-1)
            out = mlp(mlp_in[None], combine_inner_dims=(p * whw,))
            logit = _resample_batched(
                out[0, :, 0].astype(jnp.float32).reshape(p, wh, ww, 1),
                (h, w)).reshape(p, hw)
            return logit, inv_f[:, 0].reshape(p, hw)
        feats = _resample_batched(
            f_w.reshape(p, wh, ww, c_l), (h, w)).reshape(p * hw, c_l)
    else:
        feats = _fetch_features(grid, xy_f, scale)             # (P*HW, C)

    if net.learn_empty:
        empty = jnp.broadcast_to(
            net.empty_feature.astype(feats.dtype), feats.shape)
        feats = jnp.where(inv_f, empty, feats)
    coord = z_f if net.code_mode == "z" else dist_f
    coord = _normalize_coord(net, coord)
    code = net.code_xyz(jnp.concatenate([xy_f, coord], axis=-1))
    mlp_in = jnp.concatenate([feats, code.astype(feats.dtype)], axis=-1)
    out = mlp(mlp_in[None], combine_inner_dims=(p * hw,))
    return out[0, :, 0].reshape(p, hw), inv_f[:, 0].reshape(p, hw)


def query_sweep_density(net: BTSNet, variables, grid: FeatureGrid, origin,
                        dirs_full, z_samp, full_hw, dirs_warp=None,
                        warp_hw=None, mlp_at_warp: bool = False,
                        coarse: bool = True, scale: int = 0,
                        planes_per_step: int = None):
    """Density over a full frame by scanning the shared z-ladder in blocks
    of `planes_per_step` planes (each block one pure `net.apply`).

    planes_per_step defaults to 16 for the warp-res decode and 8 for the
    render-res decode (HBM-bounded), clamped to a divisor of K.

    Returns sigma (1, HW, K), invalid (1, HW, K) bool.
    """
    assert grid.features[scale].shape[0] == 1, "sweep path is per-frame"
    assert grid.features[scale].shape[1] == 1 and grid.f_combine is None, \
        "sweep path needs a single encoder view/group"
    k = z_samp.shape[0]
    if planes_per_step is None:
        planes_per_step = 16 if (mlp_at_warp and dirs_warp is not None) \
            else 8
    p = _block_divisor(k, planes_per_step)

    def body(carry, z_blk):
        logit, inv = net.apply(
            variables, grid, origin, dirs_full, z_blk, full_hw,
            dirs_warp=dirs_warp, warp_hw=warp_hw, mlp_at_warp=mlp_at_warp,
            coarse=coarse, scale=scale, method=sweep_block_density)
        return carry, (logit, inv)

    _, (logits, invalid) = jax.lax.scan(body, None,
                                        z_samp.reshape(k // p, p))
    logits = jnp.transpose(logits.reshape(k, -1))[None]        # (1, HW, K)
    invalid = jnp.transpose(invalid.reshape(k, -1))[None]
    sigma = nn.softplus(logits) if net.sample_color else nn.relu(logits)
    if net.empty_empty:
        sigma = jnp.where(invalid, 0.0, sigma)
    return sigma, invalid


def sweep_colors(grid: FeatureGrid, origin, dirs_full, z_samp, weights,
                 color_mode: str = "exact", top_m: int = 8):
    """Composite colors against precomputed weights without materializing
    (HW, K, 3) sample colors. Needs no module context (pure fetch).

    weights: (1, HW, K). Returns (rgb (1, HW, 3), invalid): per-sample
    invalid (1, HW, K) in "exact" mode (general-path semantics); reduced
    any-relevant-sample invalid (1, HW, 1) for "topm"/"expected"; "none"
    skips the color pass entirely (depth-only serving — zeros rgb,
    all-valid mask).
    """
    if color_mode == "none":
        hw = dirs_full.shape[0]
        return (jnp.zeros((1, hw, 3)),
                jnp.zeros((1, hw, 1), bool))
    assert grid.color_imgs.shape[1] == 1 and grid.c_combine is None, \
        "sweep path needs a single render view"
    pose_c = grid.c_poses_w2c[0, 0]
    k_c = grid.c_ks[0, 0]
    w_ = weights[0]                                            # (HW, K)
    hw = dirs_full.shape[0]

    if color_mode == "exact":
        k = z_samp.shape[0]
        p = _block_divisor(k, 8)   # blocks: keep each gather at P*HW rows

        def body(acc, xs):
            z_blk, wk = xs                     # (P,), (P, HW)
            pts = (origin[None, None]
                   + z_blk[:, None, None] * dirs_full[None]).reshape(-1, 3)
            xy, _, _, inv = _project_single(pts, pose_c, k_c)
            col = _fetch_colors(grid, xy).astype(jnp.float32) \
                .reshape(p, hw, 3)
            return acc + jnp.sum(wk[..., None] * col, axis=0), \
                inv[:, 0].reshape(p, hw)
        rgb, inv_k = jax.lax.scan(
            body, jnp.zeros((hw, 3)),
            (z_samp.reshape(k // p, p),
             jnp.transpose(w_).reshape(k // p, p, hw)))
        return rgb[None], jnp.transpose(inv_k.reshape(k, hw))[None]

    if color_mode == "topm":
        wv, wi = jax.lax.top_k(w_, top_m)                      # (HW, M)
        z_sel = z_samp[wi]                                     # (HW, M)
        pts = origin[None, None] + z_sel[..., None] * dirs_full[:, None]
        xy, _, _, inv = _project_single(pts.reshape(hw * top_m, 3),
                                        pose_c, k_c)
        col = _fetch_colors(grid, xy).astype(jnp.float32) \
            .reshape(hw, top_m, 3)
        inv = inv.reshape(hw, top_m, 1)
        # Renormalize the kept mass to the full mass so the dropped tail
        # does not darken the pixel.
        kept = jnp.maximum(jnp.sum(wv, -1, keepdims=True), 1e-8)
        total = jnp.sum(w_, -1, keepdims=True)
        rgb = jnp.sum(wv[..., None] * col, axis=1) * (total / kept)
        inv_any = jnp.any(inv & (wv[..., None] > 1e-4), axis=1)
        return rgb[None], inv_any[None]

    if color_mode == "expected":
        def body(acc, xs):
            z_k, wk = xs
            pts = origin[None] + z_k * dirs_full
            xy, _, _, inv = _project_single(pts, pose_c, k_c)
            return (acc[0] + wk[:, None] * xy, acc[1] | inv), None
        (xy_bar, inv_any), _ = jax.lax.scan(
            body, (jnp.zeros((hw, 2)), jnp.zeros((hw, 1), bool)),
            (z_samp, jnp.transpose(w_)))
        wsum = jnp.maximum(jnp.sum(w_, -1, keepdims=True), 1e-8)
        col = _fetch_colors(grid, xy_bar / wsum).astype(jnp.float32)
        return (col * wsum)[None], inv_any[None]

    raise NotImplementedError(color_mode)


def render_frame_sweep(net: BTSNet, variables, grid: FeatureGrid, pose_c2w,
                       proj, hw, cfg: renderer_lib.RendererConfig,
                       warp_scale: Optional[float] = 0.5,
                       mlp_at_warp: bool = True,
                       color_mode: str = "topm", top_m: int = 8,
                       z_near: Optional[float] = None,
                       z_far: Optional[float] = None,
                       planes_per_step: Optional[int] = None,
                       mesh=None):
    """Render one full novel-view frame in sweep mode.

    Args:
      pose_c2w: (4, 4) novel camera; proj: (3, 3) NDC intrinsics.
      hw: (H, W) render resolution.
      warp_scale: warp-lattice resolution as a multiple of the FEATURE
        map's (= render resolution for the monodepth2 scale-0 map —
        finding 19 — so 1.0 is an identity lattice; 0.5 is the shipped
        default, 28.4 ms/frame at equal-or-better PSNR on both converged
        families; None = exact per-sample fetch, no warp approximation).
      z_near/z_far: ladder bounds (default: the net's).
      mesh: optional (data, rays) Mesh — the render-resolution ray axis
        shards over the `rays` axis (rays are embarrassingly parallel;
        the warp lattice and feature grid replicate), same layout as the
        general path's eval sharding (parallel/mesh.eval_mesh). Applied
        when H*W divides the mesh width.
    Returns:
      dict like render_rays' output: {"coarse"/"fine": {rgb (1, HW, 3),
      depth (1, HW), invalid (1, HW, K, 1), weights, alphas, z_samps}}.
    """
    h, w = hw
    zn = net.z_near if z_near is None else z_near
    zf = net.z_far if z_far is None else z_far
    focal = jnp.stack([proj[0, 0], proj[1, 1]])
    center = jnp.stack([proj[0, 2], proj[1, 2]])
    rays = geometry.gen_rays(pose_c2w[None], w, h, zn, zf, focal=focal,
                             c=center)
    dirs_full = rays[0, ..., 3:6].reshape(h * w, 3)
    if mesh is not None and mesh.shape.get("rays", 1) > 1 \
            and (h * w) % mesh.shape["rays"] == 0:
        from jax.sharding import NamedSharding, PartitionSpec
        dirs_full = jax.lax.with_sharding_constraint(
            dirs_full, NamedSharding(mesh, PartitionSpec("rays", None)))
    origin = pose_c2w[:3, 3]
    z_samp = sweep_z_ladder(cfg.n_coarse, zn, zf, cfg.lindisp)

    dirs_warp = None
    warp_hw = None
    if warp_scale is not None:
        fh, fw = grid.features[0].shape[2:4]
        warp_hw = (max(2, int(round(fh * warp_scale))),
                   max(2, int(round(fw * warp_scale))))
        rays_w = geometry.gen_rays(pose_c2w[None], warp_hw[1], warp_hw[0],
                                   zn, zf, focal=focal, c=center)
        dirs_warp = rays_w[0, ..., 3:6].reshape(-1, 3)

    sigma, invalid = query_sweep_density(
        net, variables, grid, origin, dirs_full, z_samp, (h, w),
        dirs_warp=dirs_warp, warp_hw=warp_hw, mlp_at_warp=mlp_at_warp,
        planes_per_step=planes_per_step)

    z_b = jnp.broadcast_to(z_samp[None, None], sigma.shape)
    weights, alphas = renderer_lib.weights_from_sigma(sigma, z_b, cfg)
    depth = jnp.sum(weights * z_b, axis=-1)

    rgb, inv_c = sweep_colors(grid, origin, dirs_full, z_samp, weights,
                              color_mode=color_mode, top_m=top_m)
    out = {
        "rgb": rgb,                                    # (1, HW, 3) one view
        "depth": depth,
        "invalid": (invalid | inv_c)[..., None].astype(rgb.dtype),
        "weights": weights,
        "alphas": alphas,
        "z_samps": z_b,
    }
    return {"coarse": out, "fine": dict(out)}
