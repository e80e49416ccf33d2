"""Novel-view-synthesis evaluator (reference models/bts/evaluator_nvs.py):
encode frame 0 (optionally at a reduced resolution), render every frame from
that encoding, and compute PSNR/SSIM/LPIPS with a 5% border crop per frame.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from behindthescenes_tpu import geometry
from behindthescenes_tpu import renderer as renderer_lib
from behindthescenes_tpu.evaluation import metrics as M
from behindthescenes_tpu.models.bts import BTSNet
from behindthescenes_tpu.ray_sampler import ImageRaySampler


def _nearest_resize_nhwc(x, h, w):
    ys = (np.arange(h) * (x.shape[-3] / h)).astype(np.int64)
    xs = (np.arange(w) * (x.shape[-2] / w)).astype(np.int64)
    return x[..., ys, :, :][..., :, xs, :]


class NVSEvaluator:
    def __init__(self, net: BTSNet, renderer_cfg, config: dict,
                 eval_resolution=None, lpips_weights: Optional[str] = None):
        self.net = net
        self.cfg = renderer_cfg
        self.z_near = config["z_near"]
        self.z_far = config["z_far"]
        self.eval_resolution = tuple(eval_resolution) if eval_resolution \
            else None
        # Sweep-mode serving (models/sweep.py): deterministic shared
        # z-ladder + per-plane dense warp fetch instead of per-sample
        # gathers. Configured via model_conf.nvs_sweep: true (defaults) or
        # a dict {warp_scale, color_mode, top_m, mlp_at_warp}.
        sweep_conf = config.get("nvs_sweep")
        if sweep_conf is True:
            sweep_conf = {}
        self.sweep_conf = dict(sweep_conf) if sweep_conf else None
        self.lpips = M.LPIPSVGG.maybe_create(lpips_weights)
        # Ray-shard full-frame renders over every local device (see
        # DepthEvaluator; equivalence in tests/test_multidevice_eval.py).
        from behindthescenes_tpu.parallel.mesh import eval_mesh
        self.mesh = eval_mesh()
        self._render = None
        self._shape = None

    def _build_render(self, h, w, v):
        sampler = ImageRaySampler(self.z_near, self.z_far, height=h, width=w)
        net = self.net
        cfg = self.cfg
        er = self.eval_resolution
        sweep_conf = self.sweep_conf

        def encode(variables, images, projs, poses_r):
            enc_images = images
            if er is not None:
                ys = (jnp.arange(er[0]) * (h / er[0])).astype(jnp.int32)
                xs = (jnp.arange(er[1]) * (w / er[1])).astype(jnp.int32)
                enc_images = images[:, :, ys][:, :, :, xs]
            return net.apply(variables, enc_images, projs, poses_r,
                             ids_encoder=[0], ids_render=[0],
                             images_alt=images[:, :1] * 0.5 + 0.5,
                             method=BTSNet.encode)

        def render(variables, images, projs, poses, key):
            poses_r = geometry.rebase_poses_to_keyframe(poses)
            grid = encode(variables, images, projs, poses_r)
            rays, _ = sampler.sample(None, None, poses_r, projs)

            def query_fn(xyz, coarse):
                return net.apply(variables, grid, xyz, coarse=coarse,
                                 method=BTSNet.query)

            out = renderer_lib.render_rays_chunked(query_fn, rays, key, cfg,
                                                   ray_chunk=16384,
                                                   mesh=self.mesh)
            render_dict = {"coarse": out["coarse"],
                           "fine": out.get("fine", dict(out["coarse"]))}
            return sampler.reconstruct(render_dict)

        def render_sweep(variables, images, projs, poses, key):
            from behindthescenes_tpu.models.sweep import render_frame_sweep
            poses_r = geometry.rebase_poses_to_keyframe(poses)
            grid = encode(variables, images, projs, poses_r)
            rgbs = []
            for vi in range(v):
                out = render_frame_sweep(
                    net, variables, grid, poses_r[0, vi], projs[0, vi],
                    (h, w), cfg, mesh=self.mesh, **sweep_conf)
                rgbs.append(out["fine"]["rgb"][0])             # (HW, 3)
            rgb = jnp.stack(rgbs).reshape(1, v, h, w, 1, 3)
            return {"coarse": {"rgb": rgb}, "fine": {"rgb": rgb}}

        return jax.jit(render_sweep if sweep_conf is not None else render)

    def evaluate(self, variables, batch, key=None) -> dict:
        key = key if key is not None else jax.random.PRNGKey(0)
        images = jnp.asarray(batch["imgs"])
        n, v, h, w, _ = images.shape
        if self._render is None or self._shape != (h, w, v):
            self._render = self._build_render(h, w, v)
            self._shape = (h, w, v)
        rd = self._render(variables, images, jnp.asarray(batch["projs"]),
                          jnp.asarray(batch["poses"]), key)

        rgb_gt = np.asarray(images) * 0.5 + 0.5
        rgb_pred = np.asarray(rd["fine"]["rgb"])[0]      # (v, h, w, vr, 3)
        rgb_pred = rgb_pred.mean(-2)

        y0, y1 = int(math.ceil(0.05 * h)), int(math.floor(0.95 * h))
        x0, x1 = int(math.ceil(0.05 * w)), int(math.floor(0.95 * w))

        psnrs, ssims, lpipss = [], [], []
        for vi in range(1, v):   # frame 0 is the source; evaluate the rest
            gt = rgb_gt[0, vi, y0:y1, x0:x1]
            pred = np.clip(rgb_pred[vi, y0:y1, x0:x1], 0, 1)
            psnrs.append(M.psnr(pred, gt))
            ssims.append(M.ssim(pred, gt))
            if self.lpips is not None:
                lpipss.append(self.lpips(pred, gt))
        out = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}
        if lpipss:
            out["lpips"] = float(np.mean(lpipss))
        return out
