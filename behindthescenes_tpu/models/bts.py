"""BTSNet: the pixel-aligned density field.

Capability parity with reference models/bts/model/models_bts.py:17-338,
re-designed functionally for JAX:

  * `encode(...)` produces an explicit, immutable `FeatureGrid` pytree instead
    of mutating module state — the grid flows through jit boundaries and can
    be replicated or sharded over a mesh independently of the parameters.
  * `query(...)` evaluates the field at world points. It is a pure function of
    (params, grid, xyz) and is the body of the renderer's hot loop; everything
    in it (projection, bilinear gather, positional encoding, tiny MLP) fuses
    under XLA and is also provided as a fused Pallas kernel.

View-selection (ids_encoder / ids_render / combine_ids) is static Python
metadata — it comes from the frame_sample_mode config, so each mode compiles
its own specialization (static shapes, no dynamic gathers).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from behindthescenes_tpu import geometry
from behindthescenes_tpu.models.encoder import make_backbone
from behindthescenes_tpu.models.mlp import make_mlp
from behindthescenes_tpu.ops.grid_sample import (grid_sample_2d,
                                                 resample_uniform_lattice)
from behindthescenes_tpu.ops.posenc import PositionalEncoding

EPS = 1e-3


@flax.struct.dataclass
class FeatureGrid:
    """Everything `query` needs about the encoded input views.

    Mirrors the grid_f_* / grid_c_* attributes stashed by the reference's
    `BTSNet.encode` (models_bts.py:128-136), made explicit.
    """
    features: Tuple[jnp.ndarray, ...]          # per scale: (n, nv_e, h, w, c)
    f_ks: jnp.ndarray                          # (n, nv_e, 3, 3)
    f_poses_w2c: jnp.ndarray                   # (n, nv_e, 4, 4)
    color_imgs: jnp.ndarray                    # (n, nv_r, h, w, 3) in [0,1]
    c_ks: jnp.ndarray                          # (n, nv_r, 3, 3)
    c_poses_w2c: jnp.ndarray                   # (n, nv_r, 4, 4)
    f_combine: Optional[Tuple[Tuple[int, ...], ...]] = flax.struct.field(
        pytree_node=False, default=None)
    c_combine: Optional[Tuple[Tuple[int, ...], ...]] = flax.struct.field(
        pytree_node=False, default=None)
    # Corner-packed variants (built once in encode; one wide row-gather per
    # point instead of four, in the compute dtype). None on the f32 path.
    features_packed: Optional[Tuple[jnp.ndarray, ...]] = None
    color_imgs_packed: Optional[jnp.ndarray] = None

    @property
    def n_render_groups(self) -> int:
        if self.c_combine is not None:
            return len(self.c_combine)
        return self.color_imgs.shape[1]


def _resolve_combine(combine_ids, n_views, ids_encoder, ids_render):
    """Compute per-grid combine groups (reference models_bts.py:93-107)."""
    if combine_ids is None:
        return None, None
    # Combine groups need concrete (host-side) id values; waymo-style modes
    # use static encoder/render ids whenever combining is active.
    ids_encoder = [int(i) for i in ids_encoder]
    ids_render = [int(i) for i in ids_render]
    combine_ids = [list(map(int, g)) for g in combine_ids]
    covered = set(sum(combine_ids, []))
    for i in range(n_views):
        if i not in covered:
            combine_ids.append([i])
    remap_e = {v: i for i, v in enumerate(ids_encoder)}
    remap_r = {v: i for i, v in enumerate(ids_render)}
    comb_e = tuple(tuple(remap_e[i] for i in g if i in remap_e)
                   for g in combine_ids)
    comb_r = tuple(tuple(remap_r[i] for i in g if i in remap_r)
                   for g in combine_ids)
    comb_e = tuple(g for g in comb_e if g)
    comb_r = tuple(g for g in comb_r if g)
    return comb_e, comb_r


def _combine_first_valid(values, invalid, groups):
    """For each group of views, pick the first valid view's value
    (reference models_bts.py:190-210: torch.min over bool + gather).

    values: (n, nv, p, d); invalid: (n, nv, p, 1) bool.
    Returns (n, n_groups, p, d), (n, n_groups, p, 1).
    """
    out_v, out_i = [], []
    for group in groups:
        g = list(group)
        inv_g = invalid[:, g]                       # (n, len(g), p, 1)
        val_g = values[:, g]
        idx = jnp.argmin(inv_g.astype(jnp.int32), axis=1, keepdims=True)
        inv_pick = jnp.take_along_axis(inv_g, idx, axis=1)
        val_pick = jnp.take_along_axis(
            val_g, jnp.broadcast_to(idx, idx.shape[:-1] + (val_g.shape[-1],)),
            axis=1)
        out_v.append(val_pick)
        out_i.append(inv_pick)
    return jnp.concatenate(out_v, axis=1), jnp.concatenate(out_i, axis=1)


def _nearest_resize(x, h, w):
    """Nearest-neighbor resize on NHWC batches (torch F.interpolate
    mode='nearest' semantics: index = floor(i * scale))."""
    n, h0, w0, c = x.shape
    if (h0, w0) == (h, w):
        return x
    ys = (jnp.arange(h) * (h0 / h)).astype(jnp.int32)
    xs = (jnp.arange(w) * (w0 / w)).astype(jnp.int32)
    return x[:, ys][:, :, xs]


class BTSNet(nn.Module):
    """Density-field model (reference models_bts.py:17-338).

    Config mirrors the reference's `model_conf` block
    (configs/exp_kitti_raw.yaml:23-66).
    """
    z_near: float
    z_far: float
    encoder_conf: Any
    code_conf: Any
    mlp_coarse_conf: Any
    mlp_fine_conf: Any = None
    learn_empty: bool = True
    empty_empty: bool = False
    inv_z: bool = True
    color_interpolation: str = "bilinear"
    code_mode: str = "z"
    sample_color: bool = True
    return_sample_depth: bool = False
    compute_dtype: Any = jnp.float32
    # (rh, rw) feature-map region for the gather-free TILE fetch
    # (ops/grid_sample.grid_sample_2d_tiles — measured 6x the x-pair row
    # gathers, scripts/bench_strip_fetch.py). Used when the caller passes
    # tile-grouped points (patch-mode training, query(n_tiles=...)). Size
    # it to cover tile extent + disparity span at feature resolution;
    # points beyond a tile's region read as zeros (tile_region_fit
    # reports coverage).
    tile_region: Any = None

    def setup(self):
        if self.code_mode not in ("z", "distance"):
            raise NotImplementedError(self.code_mode)
        self.encoder = make_backbone(dict(self.encoder_conf),
                                     compute_dtype=self.compute_dtype)
        self.code_xyz = PositionalEncoding.from_conf(dict(self.code_conf),
                                                     d_in=3)
        d_out = 1 if self.sample_color else 4
        mlp_dtype = self.compute_dtype \
            if self.compute_dtype != jnp.float32 else None
        self.mlp_coarse = make_mlp(dict(self.mlp_coarse_conf), d_out=d_out,
                                   dtype=mlp_dtype)
        fine_conf = dict(self.mlp_fine_conf) if self.mlp_fine_conf else \
            {"type": "empty"}
        self.mlp_fine = make_mlp(fine_conf, d_out=d_out, allow_empty=True,
                                 dtype=mlp_dtype)
        if self.learn_empty:
            self.empty_feature = self.param(
                "empty_feature", nn.initializers.normal(1.0),
                (self.encoder.latent_size,))

    @property
    def d_in(self) -> int:
        return self.encoder.latent_size + self.code_xyz.d_out

    def __call__(self, images, ks, poses_c2w, xyz):
        """Init-shim: encode then query (for parameter initialization)."""
        grid = self.encode(images, ks, poses_c2w)
        return self.query(grid, xyz)

    # ------------------------------------------------------------------ encode
    def encode(self, images, ks, poses_c2w, ids_encoder=None, ids_render=None,
               images_alt=None, combine_ids=None, do_flip=False,
               train: bool = False, combine_encoder=None,
               combine_render=None) -> FeatureGrid:
        """Run the CNN over selected views and build the feature grid.

        Args:
          images: (n, v, h, w, 3) in [-1, 1].
          ks: (n, v, 3, 3) NDC intrinsics.
          poses_c2w: (n, v, 4, 4).
          ids_encoder / ids_render: static lists of view indices (or None=all).
          images_alt: optional substitute color images (already in [0, 1]).
          combine_ids: static groups of view ids to combine.
          do_flip: traced bool — horizontal flip augmentation of the latent
            (reference models_bts.py:112-123).
        """
        n, v, h, w, _ = images.shape
        poses_w2c = geometry.invert_pose(poses_c2w)

        if ids_encoder is None:
            ids_encoder = list(range(v))
        if ids_render is None:
            ids_render = list(range(v))
        # ids may be static Python lists or traced int arrays (so the random
        # per-step view permutation does not trigger recompilation).
        if not hasattr(ids_encoder, "shape"):
            ids_encoder = jnp.asarray(list(ids_encoder), dtype=jnp.int32)
        if not hasattr(ids_render, "shape"):
            ids_render = jnp.asarray(list(ids_render), dtype=jnp.int32)

        images_encoder = images[:, ids_encoder]
        ks_encoder = ks[:, ids_encoder]
        poses_w2c_encoder = poses_w2c[:, ids_encoder]

        images_color = images_alt if images_alt is not None \
            else images * 0.5 + 0.5
        images_render = images_color[:, ids_render]
        ks_render = ks[:, ids_render]
        poses_w2c_render = poses_w2c[:, ids_render]

        if combine_encoder is not None or combine_render is not None:
            # Pre-resolved positional groups (waymo training: id VALUES are
            # traced, group structure static — see ViewIds).
            comb_e, comb_r = combine_encoder, combine_render
        else:
            comb_e, comb_r = _resolve_combine(combine_ids, v, ids_encoder,
                                              ids_render)

        nv = len(ids_encoder)
        do_flip = jnp.asarray(do_flip)
        imgs = jnp.where(do_flip, images_encoder[:, :, :, ::-1, :],
                         images_encoder)
        with jax.named_scope("encoder_forward"):
            latents = self.encoder(imgs.reshape(n * nv, h, w, 3), train)
        latents = [jnp.where(do_flip, l[:, :, ::-1, :], l) for l in latents]

        h0, w0 = latents[0].shape[1:3]
        c_l = self.encoder.latent_size
        feats = tuple(
            _nearest_resize(l, h0, w0).reshape(n, nv, h0, w0, c_l)
            for l in latents)

        features_packed = None
        color_imgs_packed = None
        if self.compute_dtype != jnp.float32:
            from behindthescenes_tpu.ops.grid_sample import (pack_corners,
                                                             pack_corners_x)
            # Wide-channel maps pack only the x-pair (2C-element gather
            # rows): rows >128 elements hit a ~6x slower TPU gather path
            # (PERF.md). Narrow maps keep the 4-corner pack (1 gather).
            pack = pack_corners_x if c_l > 32 else pack_corners
            features_packed = tuple(
                pack(f.astype(self.compute_dtype)) for f in feats)
            # Don't hold a second full-precision copy: the unpacked view is
            # corner slice 0 of the packed map (lazy; DCE'd when unused).
            feats = tuple(p[..., :c_l] for p in features_packed)
            if self.color_interpolation == "bilinear":
                # f16 rows: the color gather is row-latency/byte bound
                # (24B vs 48B rows ≈ 2x); f16's 2^-11 mantissa error on
                # [0,1] colors sits well below 8-bit quantization noise
                # (bf16 would not). Interp math stays f32 after the gather.
                color_imgs_packed = pack_corners(
                    images_render.astype(jnp.float16))

        return FeatureGrid(
            features=feats, f_ks=ks_encoder, f_poses_w2c=poses_w2c_encoder,
            color_imgs=images_render, c_ks=ks_render,
            c_poses_w2c=poses_w2c_render, f_combine=comb_e, c_combine=comb_r,
            features_packed=features_packed,
            color_imgs_packed=color_imgs_packed)

    # ----------------------------------------------------------------- queries
    def sample_features(self, grid: FeatureGrid, xyz, scale: int = 0,
                        use_single_featuremap: bool = True,
                        n_tiles: Optional[int] = None):
        """Pixel-aligned feature lookup + positional code
        (reference models_bts.py:138-216).

        xyz: (n, p, 3) world points. n_tiles: points are grouped into this
        many per-batch tiles with compact projections (patch-mode
        training) — enables the tile-region fetch when `tile_region` is
        configured.
        Returns (features (n, [nv,] p, c + d_code), invalid (n, [nv,] p, 1)).
        """
        feature_map = grid.features[scale]
        n, nv, h, w, c = feature_map.shape

        xy, z, distance, invalid = geometry.project_points(
            xyz, grid.f_poses_w2c, grid.f_ks, eps=EPS)

        if self.code_mode == "z":
            coord = z
        else:
            coord = distance
        if self.inv_z:
            coord = ((1.0 / jnp.maximum(coord, EPS) - 1.0 / self.z_far)
                     / (1.0 / self.z_near - 1.0 / self.z_far))
        else:
            coord = (coord - self.z_near) / (self.z_far - self.z_near)
        coord = 2.0 * coord - 1.0
        xyz_code = self.code_xyz(jnp.concatenate([xy, coord], axis=-1))

        if n_tiles is not None and self.tile_region is not None:
            # Gather-free tile fetch: per tile, one dynamic_slice region +
            # separable hat matmuls on the otherwise-idle MXU (exact
            # border-bilinear semantics within each tile's region;
            # tests/test_grid_sample.py). Uses the unpacked map in the
            # compute dtype — same interp precision class as the packed
            # row-gather path.
            from behindthescenes_tpu.ops.grid_sample import (
                grid_sample_2d_tiles)
            p_total = xy.shape[2]
            tp = p_total // n_tiles
            ims = feature_map.reshape(n * nv, h, w, c)
            co = xy.reshape(n * nv, n_tiles, tp, 2)
            region = tuple(int(r) for r in self.tile_region)
            sampled = jax.vmap(
                lambda im, c2: grid_sample_2d_tiles(im, c2, region))(
                    ims, co)
            sampled = sampled.reshape(n, nv, p_total, c)
        elif grid.features_packed is not None:
            # Packed row gathers instead of four narrow ones; bf16 values
            # halve the dominant per-point training activations (the corner
            # tensors), which otherwise push XLA into auto-remat at
            # reference batch sizes. Packing happened once in encode. Wide
            # maps use the x-pair scheme (2 gathers of <=128-element rows,
            # see pack_corners_x); narrow maps the 4-corner scheme.
            from behindthescenes_tpu.ops.grid_sample import (
                grid_sample_2d_packed, grid_sample_2d_xpair)
            packed = grid.features_packed[scale]
            c_l = feature_map.shape[-1]
            if packed.shape[-1] == 2 * c_l:
                sampled = grid_sample_2d_xpair(packed, xy)
            else:
                sampled = grid_sample_2d_packed(packed, xy)
            # Stay in compute dtype: the MLP matmuls run in it anyway, and
            # an f32 concat would materialize 2x the bytes (101MB per 245k
            # points at the flagship width) for no precision gain.
        else:
            sampled = grid_sample_2d(feature_map, xy, align_corners=False,
                                     padding_mode="border")  # (n, nv, p, c)
        if self.learn_empty:
            empty = jnp.broadcast_to(
                self.empty_feature.astype(sampled.dtype), sampled.shape)
            sampled = jnp.where(invalid, empty, sampled)

        sampled = jnp.concatenate(
            [sampled, xyz_code.astype(sampled.dtype)], axis=-1)

        if grid.f_combine is not None:
            sampled, invalid = _combine_first_valid(sampled, invalid,
                                                    grid.f_combine)
        if use_single_featuremap:
            sampled = jnp.mean(sampled, axis=1)
            invalid = jnp.any(invalid, axis=1)
        return sampled, invalid

    def sample_colors(self, grid: FeatureGrid, xyz):
        """Re-sample color from render views (reference models_bts.py:218-264).

        Returns (colors (n, nv, p, 3[+1]), invalid (n, nv, p, 1)).
        """
        xy, z, distance, invalid = geometry.project_points(
            xyz, grid.c_poses_w2c, grid.c_ks, eps=EPS)
        if self.color_interpolation == "bilinear":
            # One wide row-gather per point instead of four narrow ones
            # (RGB rows are only 12 bytes; gather cost is per-row).
            from behindthescenes_tpu.ops.grid_sample import (
                grid_sample_2d_packed, pack_corners)
            packed = grid.color_imgs_packed \
                if grid.color_imgs_packed is not None \
                else pack_corners(grid.color_imgs)
            colors = grid_sample_2d_packed(packed, xy)
        else:
            colors = grid_sample_2d(grid.color_imgs, xy,
                                    align_corners=False,
                                    padding_mode="border",
                                    mode=self.color_interpolation)
        if grid.c_combine is not None:
            colors, invalid = _combine_first_valid(colors, invalid,
                                                   grid.c_combine)
        if self.return_sample_depth:
            colors = jnp.concatenate([colors, distance], axis=-1)
        return colors, invalid

    def query(self, grid: FeatureGrid, xyz, coarse: bool = True,
              only_density: bool = False, scale: int = 0,
              n_tiles: Optional[int] = None):
        """Evaluate the field at world points
        (reference models_bts.py:266-338).

        xyz: (n, p, 3). n_tiles: see sample_features.
        Returns rgb (n, p, nv*3), invalid (n, p, nv) float, sigma (n, p, 1).
        """
        n, n_pts, _ = xyz.shape
        with jax.named_scope("sample_features"):
            feats, invalid_features = self.sample_features(
                grid, xyz, scale=scale,
                use_single_featuremap=not only_density, n_tiles=n_tiles)

        if only_density and feats.ndim == 4:
            # Density grid queries run with a single (possibly combined)
            # encoder view; fold it away statically.
            assert feats.shape[1] == 1, \
                "only_density requires a single encoder view/group"
            feats = feats[:, 0]
            invalid_features = invalid_features[:, 0]

        mlp = self.mlp_coarse if (coarse or self.mlp_fine is None) \
            else self.mlp_fine
        with jax.named_scope("field_mlp"):
            mlp_output = mlp(feats, combine_inner_dims=(n_pts,))

        if self.sample_color:
            sigma = nn.softplus(mlp_output[..., :1])
        else:
            sigma = nn.relu(mlp_output[..., :1])

        if self.empty_empty:
            sigma = jnp.where(invalid_features, 0.0, sigma)

        if only_density:
            nv = grid.n_render_groups
            rgb = jnp.zeros((n, n_pts, nv * 3), dtype=sigma.dtype)
            invalid = invalid_features.astype(sigma.dtype)
            return rgb, invalid, sigma

        if self.sample_color:
            with jax.named_scope("sample_colors"):
                rgb, invalid_colors = self.sample_colors(grid, xyz)
        else:
            rgb = nn.sigmoid(mlp_output[..., 1:4])[:, None]       # (n,1,p,3)
            invalid_colors = invalid_features[:, None]
        nv, cc = rgb.shape[1], rgb.shape[-1]
        rgb = jnp.swapaxes(rgb, 1, 2).reshape(n, n_pts, nv * cc)
        invalid_colors = jnp.swapaxes(invalid_colors, 1, 2).reshape(
            n, n_pts, nv)
        invalid = invalid_colors | invalid_features
        return rgb, invalid.astype(rgb.dtype), sigma

    def query_selfview_density_shared_z(self, grid: FeatureGrid, z_cam,
                                        coarse: bool = True, scale: int = 0,
                                        out_hw=None):
        """Deterministic self-view density: one CAMERA-Z sample ladder shared
        by every ray (TPU-first inference mode; no reference analogue).

        With code_mode=="z" the positional code depends only on camera z, so
        a shared ladder makes the per-sample half of lin_in a tiny (K, 64)
        table and the MLP an outer sum — XLA loop-fuses it without
        materializing the (hw, K, 64) hidden tensor (~2x query speedup).

        z_cam: (K,) camera-z sample positions. Returns sigma (1, hw, K).
        """
        assert self.code_mode == "z", "shared-z fast path needs code_mode=z"
        from behindthescenes_tpu.models.mlp import ResnetFC
        feature_map = grid.features[scale]
        n, nv, fh, fw, c = feature_map.shape
        assert n == 1
        h, w = out_hw if out_hw is not None else (fh, fw)

        xs = jnp.linspace(-1.0, 1.0, w, dtype=feature_map.dtype)
        ys = jnp.linspace(-1.0, 1.0, h, dtype=feature_map.dtype)
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
        xy = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)
        # Uniform static lattice -> separable MXU resample instead of 4
        # gather streams (1.21 -> ~0.07 ms/frame, PERF.md finding 12).
        feats = resample_uniform_lattice(
            feature_map[0, 0], (h, w)).reshape(1, h * w, c)

        coord = z_cam
        if self.inv_z:
            coord = ((1.0 / jnp.maximum(coord, EPS) - 1.0 / self.z_far)
                     / (1.0 / self.z_near - 1.0 / self.z_far))
        else:
            coord = (coord - self.z_near) / (self.z_far - self.z_near)
        coord = 2.0 * coord - 1.0                                  # (K,)

        mlp = self.mlp_coarse if (coarse or self.mlp_fine is None) \
            else self.mlp_fine
        assert isinstance(mlp, ResnetFC)
        pe = self.code_xyz
        code_xy = pe.subset((0, 1))(xy)
        code_z = pe.subset((2,))(coord[:, None])                   # (K, 13)
        rows_static = jnp.concatenate([
            jnp.arange(c), c + jnp.asarray(pe.subset_rows((0, 1)))])
        rows_dyn = c + jnp.asarray(pe.subset_rows((2,)))
        x_static = jnp.concatenate([feats[0], code_xy], axis=-1)
        out = mlp.call_split_shared(x_static, code_z, rows_static, rows_dyn)
        sigma = nn.softplus(out[..., 0]) if self.sample_color \
            else nn.relu(out[..., 0])
        return sigma[None]                                          # (1,hw,K)

    def query_selfview_density(self, grid: FeatureGrid, z_samp,
                               coarse: bool = True, scale: int = 0,
                               out_hw=None):
        """Dense density query for rays cast FROM the encoder camera itself.

        TPU-first specialization absent from the reference: when rendering
        the keyframe with ids_encoder=[0] (eval_depth keyframe render,
        gen_img depth maps, BEV density profiles), every sample along the
        ray through pixel (u, v) projects back to (u, v) in the feature
        frame — the bilinear gather (reference models_bts.py:179) becomes a
        dense read of the feature map, eliminating the latency-bound gather
        entirely. Only the z positional code varies per sample.

        Args:
          grid: FeatureGrid from `encode` (first encoder view is used; its
            camera must be the ray source — i.e. the keyframe).
          z_samp: (h*w, K) per-pixel sample distances along *normalized*
            ray directions (ImageRaySampler convention).
        Returns:
          sigma: (1, h*w, K).
        """
        feature_map = grid.features[scale]
        n, nv, fh, fw, c = feature_map.shape
        assert n == 1, "self-view fast path is per-image"
        h, w = out_hw if out_hw is not None else (fh, fw)

        # NDC pixel coordinates (the projection of every sample on the ray).
        xs = jnp.linspace(-1.0, 1.0, w, dtype=feature_map.dtype)
        ys = jnp.linspace(-1.0, 1.0, h, dtype=feature_map.dtype)
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
        xy = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)  # (h*w, 2)

        # One bilinear resample per FRAME (not per sample): with
        # align_corners=False the [-1,1] pixel grid does not land on texel
        # centers, so parity with the general path (models_bts.py:179)
        # needs this blend. It amortizes over all K samples of every ray;
        # the static lattice factors into a separable MXU resample
        # (PERF.md finding 12).
        feats = resample_uniform_lattice(
            feature_map[0, 0], (h, w)).reshape(1, h * w, c)    # (1, h*w, c)

        # Camera z of each sample: z_samp is distance along the unit ray;
        # the ray's camera-frame direction has z-component 1/norm(dir_cam).
        k_mat = grid.f_ks[0, 0]
        fx, fy = k_mat[0, 0], k_mat[1, 1]
        cx, cy = k_mat[0, 2], k_mat[1, 2]
        dirs = jnp.stack([(xy[:, 0] - cx) / fx, (xy[:, 1] - cy) / fy,
                          jnp.ones_like(xy[:, 0])], -1)
        inv_norm = 1.0 / jnp.linalg.norm(dirs, axis=-1)        # (h*w,)
        z_cam = z_samp * inv_norm[:, None]                      # (h*w, K)

        if self.code_mode == "z":
            coord = z_cam
        else:
            coord = z_samp  # distance along the ray IS the distance code
        if self.inv_z:
            coord = ((1.0 / jnp.maximum(coord, EPS) - 1.0 / self.z_far)
                     / (1.0 / self.z_near - 1.0 / self.z_far))
        else:
            coord = (coord - self.z_near) / (self.z_far - self.z_near)
        coord = 2.0 * coord - 1.0                               # (h*w, K)

        k = z_samp.shape[-1]
        mlp = self.mlp_coarse if (coarse or self.mlp_fine is None) \
            else self.mlp_fine
        from behindthescenes_tpu.models.mlp import ResnetFC
        if isinstance(mlp, ResnetFC):
            # Hoist everything constant along the ray out of the per-sample
            # loop: the features AND the x/y positional-code dims (26 of the
            # 39 code dims in the flagship config). Per sample only the
            # 13-dim z-code feeds the MLP.
            pe = self.code_xyz
            code_xy = pe.subset((0, 1))(xy)                 # (h*w, 26)
            rows_static = jnp.concatenate([
                jnp.arange(c), c + jnp.asarray(pe.subset_rows((0, 1)))])
            rows_dyn = c + jnp.asarray(pe.subset_rows((2,)))
            x_static = jnp.concatenate([feats[0], code_xy], axis=-1)
            from behindthescenes_tpu.ops.pallas.jitter_density import (
                jitter_kernel_enabled)
            if (jitter_kernel_enabled() and mlp.n_blocks == 0
                    and mlp.beta == 0 and mlp.d_latent == 0
                    and pe.include_input
                    and (mlp.dtype or x_static.dtype) == jnp.bfloat16):
                # Fused Pallas path: posenc + lin_in + relu + lin_out in
                # VMEM — removes ~3.9 ms/frame of HBM intermediates
                # (PERF.md kernel index; BTS_JITTER_PALLAS=0 reverts).
                # bf16-only: the kernel's matmuls are bf16, so an
                # f32-configured model (bf16: false) must keep the jnp
                # path's f32 numerics rather than silently downcast.
                out = mlp.call_split_jitter(
                    x_static, coord, rows_static, rows_dyn,
                    n_freqs=pe.num_freqs, freq_factor=pe.freq_factor)
                out = out.reshape(1, h * w, k)
            else:
                code_z = pe.subset((2,))(coord[..., None])  # (h*w, K, 13)
                out = mlp.call_split(x_static, code_z, rows_static,
                                     rows_dyn)
                out = out.reshape(1, h * w, k, -1)[..., 0]
        else:
            xyz_proj = jnp.concatenate(
                [jnp.broadcast_to(xy[:, None, :], (h * w, k, 2)),
                 coord[..., None]], axis=-1)
            code = self.code_xyz(xyz_proj)                  # (h*w, K, dc)
            mlp_in = jnp.concatenate(
                [jnp.broadcast_to(feats[0][:, None, :], (h * w, k, c)),
                 code], axis=-1)
            out = mlp(mlp_in.reshape(1, h * w * k, -1),
                      combine_inner_dims=(h * w * k,))
            out = out[..., 0].reshape(1, h * w, k)
        sigma = nn.softplus(out) if self.sample_color else nn.relu(out)
        return sigma

    @classmethod
    def from_conf(cls, conf: dict, compute_dtype=jnp.float32) -> "BTSNet":
        return cls(
            z_near=conf["z_near"],
            z_far=conf["z_far"],
            encoder_conf=dict(conf["encoder"]),
            code_conf=dict(conf.get("code", {})),
            mlp_coarse_conf=dict(conf["mlp_coarse"]),
            mlp_fine_conf=dict(conf.get("mlp_fine", {"type": "empty"})),
            learn_empty=conf.get("learn_empty", True),
            empty_empty=conf.get("empty_empty", False),
            tile_region=(tuple(conf["tile_fetch_region"])
                         if conf.get("tile_fetch_region") else None),
            inv_z=conf.get("inv_z", True),
            color_interpolation=conf.get("color_interpolation", "bilinear"),
            code_mode=conf.get("code_mode", "z"),
            sample_color=conf.get("sample_color", True),
            return_sample_depth=conf.get("return_sample_depth", False),
            compute_dtype=compute_dtype,
        )
