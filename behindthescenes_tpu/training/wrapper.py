"""BTSWrapper: the task forward pass that turns a data batch into render
outputs + supervision targets (reference models/bts/trainer.py:32-276).

`forward` is a pure function (params, batch, key, ids) -> data dict, designed
to be jitted/pjitted by the trainer. View-id *values* are traced (no
recompile across random permutations); view *counts* and the frame-sample
mode are static.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from behindthescenes_tpu import geometry
from behindthescenes_tpu import renderer as renderer_lib
from behindthescenes_tpu.losses import compute_errors_l1ssim
from behindthescenes_tpu.models.bts import BTSNet
from behindthescenes_tpu.models.image_processor import (RGBProcessor,
                                                        make_image_processor)
from behindthescenes_tpu.ray_sampler import make_ray_sampler, ImageRaySampler
from behindthescenes_tpu.training.view_select import ViewIds, select_views


class BTSWrapper:
    """Holds static task config + the net definition; all state is explicit."""

    def __init__(self, net: BTSNet, renderer_cfg: renderer_lib.RendererConfig,
                 config: dict):
        self.net = net
        self.renderer_cfg = renderer_cfg
        has_fine_mlp = bool(net.mlp_fine_conf) and \
            net.mlp_fine_conf.get("type", "empty") != "empty"
        if renderer_cfg.fine_reuse_coarse and has_fine_mlp:
            # With a distinct fine MLP the reference fine pass re-queries the
            # coarse z's THROUGH THE FINE MLP (nerf.py:230-238 + the
            # coarse-flag dispatch, models_bts.py:311-321); cached coarse
            # values would come from the coarse MLP and diverge.
            raise ValueError(
                "renderer.fine_reuse_coarse requires mlp_fine: empty "
                "(the fine pass must evaluate the same network as coarse)")

        self.z_near = config["z_near"]
        self.z_far = config["z_far"]
        self.ray_batch_size = config.get("ray_batch_size", 2048)
        frames_render = config.get("n_frames_render", 2)
        self.frame_sample_mode = config.get("frame_sample_mode", "default")
        self.loss_from_single_img = config.get("loss_from_single_img", False)
        self.sample_mode = config.get("sample_mode", "random")
        self.patch_size = config.get("patch_size", 16)
        self.prediction_mode = config.get("prediction_mode", "multiscale")
        self.use_automasking = config.get("use_automasking", False)
        self.flip_augmentation = config.get("flip_augmentation", False)
        self.alternating_ratio = config.get("alternating_ratio", None)

        self.remat_render = config.get("remat_render", False)
        self.train_ray_chunk = config.get("train_ray_chunk", 512)
        self.eval_ray_chunk = config.get("eval_ray_chunk", 16384)
        self.train_image_processor = make_image_processor(
            config.get("image_processor", {}))
        self.val_image_processor = RGBProcessor()

        if isinstance(frames_render, int):
            self.frames_render = list(range(frames_render))
        else:
            self.frames_render = list(frames_render)

        channels = self.train_image_processor.channels
        if self.use_automasking:
            channels += 1
        self.train_sampler = make_ray_sampler(
            self.sample_mode, self.ray_batch_size, self.z_near, self.z_far,
            patch_size=self.patch_size, channels=channels)
        self.val_sampler = ImageRaySampler(self.z_near, self.z_far)

        # Gather-free tile-region feature fetch (model_conf
        # tile_fetch_region, ops/grid_sample.grid_sample_2d_tiles): only
        # patch-mode TRAINING rays are tile-grouped (one 8x8 patch's
        # samples project into a compact quad); validation/eval rays are
        # full frames and keep the gather path.
        self.query_tiles = None
        if (self.sample_mode == "patch"
                and getattr(self.net, "tile_region", None) is not None):
            self.query_tiles = self.train_sampler.patch_count

    # ------------------------------------------------------------- host side
    def select_views(self, rng, v: int, training: bool) -> ViewIds:
        return select_views(rng, v, self.frames_render,
                            self.frame_sample_mode, training,
                            self.loss_from_single_img)

    # ------------------------------------------------------------ pure parts
    def forward(self, variables, batch: dict, key, ids: ViewIds,
                train: bool = False,
                renderer_cfg: Optional[renderer_lib.RendererConfig] = None):
        """Run encode → ray sampling → render → reconstruct.

        Args:
          variables: flax variables {"params": ..., "batch_stats": ...}.
          batch: {"imgs": (n, v, h, w, 3) in [-1,1], "poses": (n, v, 4, 4)
            c2w, "projs": (n, v, 3, 3)}; optionally "depths".
          ids: ViewIds from `select_views` (arrays traced).
        Returns:
          (data dict, updated_variables) — data mirrors the reference's
          output dict: coarse/fine per-scale lists, rgb_gt, rays.
        """
        cfg = renderer_cfg or self.renderer_cfg
        net = self.net
        images = batch["imgs"]
        poses = batch["poses"]
        projs = batch["projs"]
        n, v, h, w, c = images.shape

        k_flip, k_rays, k_render = jax.random.split(key, 3)

        poses = geometry.rebase_poses_to_keyframe(poses)

        ip = self.train_image_processor if train else self.val_image_processor
        images_ip = ip(images)

        if self.use_automasking and train:
            # Baseline reconstruction error achievable by copying a loss
            # frame, appended as a supervision channel that flows through
            # the render (reference trainer.py:201-206: both sides at 0.5x,
            # mean over the candidate frames).
            ref_imgs = images_ip * 0.5                      # (n, v, h, w, 3)
            cand = jnp.take(images_ip, ids.ids_loss, axis=1) * 0.5
            n_cand = cand.shape[1]
            a = jnp.broadcast_to(ref_imgs[:, :, :, :, None, :],
                                 (n, v, h, w, n_cand, 3))
            b = jnp.broadcast_to(
                cand.transpose(0, 2, 3, 1, 4)[:, None],
                (n, v, h, w, n_cand, 3))
            errors = compute_errors_l1ssim(a, b)            # (n,v,h,w,nc,1)
            errors = jnp.mean(errors, axis=-2)              # (n, v, h, w, 1)
            images_ip = jnp.concatenate([images_ip, errors], axis=-1)

        do_flip = (jax.random.uniform(k_flip, ()) > 0.5) \
            if (self.flip_augmentation and train) else jnp.asarray(False)

        mutable = ["batch_stats"] if train else False
        encode_kwargs = dict(
            ids_encoder=ids.ids_encoder, ids_render=ids.ids_render,
            # The render/color images are the processed images (with the
            # automask channel when enabled — it renders like a color).
            images_alt=images_ip,
            combine_ids=ids.combine_ids,
            combine_encoder=ids.combine_encoder,
            combine_render=ids.combine_render,
            do_flip=do_flip, train=train)
        if mutable:
            grid, updates = net.apply(variables, images, projs, poses,
                                      method=BTSNet.encode, mutable=mutable,
                                      **encode_kwargs)
            new_variables = {**variables, **updates}
        else:
            grid = net.apply(variables, images, projs, poses,
                             method=BTSNet.encode, **encode_kwargs)
            new_variables = variables

        if train:
            sampler = self.train_sampler
        else:
            import dataclasses as _dc
            sampler = _dc.replace(self.val_sampler, height=h, width=w)
        all_rays, all_rgb_gt = sampler.sample(
            k_rays,
            jnp.take(images_ip, ids.ids_loss, axis=1),
            jnp.take(poses, ids.ids_loss, axis=1),
            jnp.take(projs, ids.ids_loss, axis=1))

        data = dict(batch)
        data["coarse"] = []
        data["fine"] = []

        scales = (list(self.net_scales())
                  if self.prediction_mode == "multiscale" else [0])
        for si, scale in enumerate(scales):
            scale_cfg = cfg
            if si > 0 and cfg.using_fine:
                import dataclasses as _dc
                scale_cfg = _dc.replace(cfg, n_fine=0, n_fine_depth=0)

            use_chunked_remat = train and self.remat_render

            def do_render(variables_, grid_, rays_, _scale=scale,
                          _cfg=scale_cfg):
                def query_fn(xyz, coarse):
                    return self.net.apply(variables_, grid_, xyz,
                                          coarse=coarse, scale=_scale,
                                          n_tiles=(self.query_tiles
                                                   if train else None),
                                          method=BTSNet.query)
                if use_chunked_remat:
                    # Ray-chunked render with per-chunk remat: the per-point
                    # feature/code/MLP intermediates are the dominant
                    # training activations; this makes training memory
                    # constant in ray count (the difference between batch 4
                    # and the reference's batch 16 fitting in 16GB HBM).
                    return renderer_lib.render_rays_chunked(
                        query_fn, rays_, k_render, _cfg,
                        ray_chunk=self.train_ray_chunk, remat_body=True,
                        want_weights=True, want_alphas=True,
                        want_rgb_samps=True)
                if not train:
                    # In-training validation renders FULL frames for every
                    # view: unchunked, a single 192x640 frame's per-sample
                    # tensors allocate ~17.5GB (> HBM; PERF.md item 6).
                    # Chunk inside the jit, and skip rgb_samps — only the
                    # weight_guided_diverse TRAIN loss consumes them.
                    return renderer_lib.render_rays_chunked(
                        query_fn, rays_, k_render, _cfg,
                        ray_chunk=self.eval_ray_chunk,
                        want_weights=True, want_alphas=True)
                return renderer_lib.render_rays(
                    query_fn, rays_, k_render, _cfg, want_weights=True,
                    want_alphas=True, want_rgb_samps=True)

            render_dict = do_render(new_variables, grid, all_rays)
            if "fine" not in render_dict:
                render_dict["fine"] = dict(render_dict["coarse"])
            render_dict["rgb_gt"] = all_rgb_gt
            render_dict = sampler.reconstruct(render_dict)
            data["coarse"].append(render_dict["coarse"])
            data["fine"].append(render_dict["fine"])
            data["rgb_gt"] = render_dict.get("rgb_gt")
        data["rays"] = all_rays
        data["z_near"] = jnp.asarray(self.z_near)
        data["z_far"] = jnp.asarray(self.z_far)

        if not train:
            data["coarse"][0] = dict(data["coarse"][0])
            data["fine"][0] = dict(data["fine"][0])
            data["coarse"][0]["depth"] = geometry.distance_to_z(
                data["coarse"][0]["depth"], projs)
            data["fine"][0]["depth"] = geometry.distance_to_z(
                data["fine"][0]["depth"], projs)

        return data, new_variables

    def net_scales(self):
        enc = dict(self.net.encoder_conf)
        if enc.get("type", "monodepth2") == "monodepth2":
            return tuple(enc.get("scales", (0, 1, 2, 3)))
        return (0,)


def compute_depth_metrics(data, clip_max: float = 80.0):
    """Depth benchmark metrics (reference trainer.py:278-316).

    Uses a validity mask instead of boolean indexing (jit-safe).
    """
    depth_gt = data["depths"][:, 0]                  # (n, h, w) or (n,1,h,w)
    depth_pred = data["fine"][0]["depth"][:, 0]      # (n, h, w)
    if depth_gt.ndim == 4:
        depth_gt = depth_gt[:, 0]
    if depth_pred.shape != depth_gt.shape:
        # nearest resize to GT resolution
        gh, gw = depth_gt.shape[-2:]
        ph, pw = depth_pred.shape[-2:]
        ys = (jnp.arange(gh) * (ph / gh)).astype(jnp.int32)
        xs = (jnp.arange(gw) * (pw / gw)).astype(jnp.int32)
        depth_pred = depth_pred[:, ys][:, :, xs]

    depth_pred = jnp.clip(depth_pred, 1e-3, clip_max)
    mask = (depth_gt != 0)
    safe_gt = jnp.where(mask, depth_gt, 1.0)
    cnt = jnp.maximum(jnp.sum(mask), 1)

    def mmean(x):
        return jnp.sum(jnp.where(mask, x, 0.0)) / cnt

    thresh = jnp.maximum(safe_gt / depth_pred, depth_pred / safe_gt)
    a1 = mmean((thresh < 1.25).astype(jnp.float32))
    a2 = mmean((thresh < 1.25 ** 2).astype(jnp.float32))
    a3 = mmean((thresh < 1.25 ** 3).astype(jnp.float32))
    rmse = jnp.sqrt(mmean((safe_gt - depth_pred) ** 2))
    rmse_log = jnp.sqrt(mmean((jnp.log(safe_gt)
                               - jnp.log(depth_pred)) ** 2))
    abs_rel = mmean(jnp.abs(safe_gt - depth_pred) / safe_gt)
    sq_rel = mmean((safe_gt - depth_pred) ** 2 / safe_gt)
    return {"abs_rel": abs_rel, "sq_rel": sq_rel, "rmse": rmse,
            "rmse_log": rmse_log, "a1": a1, "a2": a2, "a3": a3}
