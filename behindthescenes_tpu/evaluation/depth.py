"""Depth benchmark evaluator (reference models/bts/evaluator.py:25-218).

Encodes the keyframe, renders all provided frames full-image, converts
ray distance to z-depth, optionally aligns scale (median / L2 least
squares), and computes the 7 standard depth metrics plus (optionally) NVS
metrics against the stereo frame with a 5% border crop.
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


class DepthEvaluator:
    def __init__(self, net: BTSNet, renderer_cfg, config: dict,
                 eval_nvs: bool = False, lpips_weights: Optional[str] = None):
        self.net = net
        self.cfg = renderer_cfg
        self.z_near = config["z_near"]
        self.z_far = config["z_far"]
        self.depth_scaling = config.get("depth_scaling", None)
        self.eval_nvs = eval_nvs
        self.lpips = M.LPIPSVGG.maybe_create(lpips_weights) if eval_nvs \
            else None
        # Keyframe depth via the self-view fast path (inference.py:
        # render_depth_selfview): ~3-7 ms/frame vs ~159 ms through the
        # general chunked query, parity 5e-3 depth (PERF.md) — far below
        # the depth metrics' sensitivity, gated by
        # tests/test_accuracy_gate.py. "auto" = on for both code modes
        # when only the keyframe depth is needed (NVS eval needs
        # cross-view color, which only the general path produces).
        # code_mode=z additionally collapses to the deterministic shared-z
        # ladder; distance mode keeps reference-semantics stratified
        # jitter (query_selfview_density computes the distance coord
        # directly — models/bts.py:517-518).
        sv = config.get("eval_selfview", "auto")
        code_mode = config.get("code_mode", "z")
        self.use_selfview = (code_mode in ("z", "distance")) \
            if sv == "auto" else bool(sv)
        self._sv_deterministic = code_mode == "z"
        # Multi-chip: shard the general path's ray dimension over every
        # local device (parallel/mesh.eval_mesh; the reference's analogue
        # is the DDP eval it gets from idist, utils/base_evaluator.py:15).
        # Equivalence vs single-device is pinned in
        # tests/test_multidevice_eval.py.
        from behindthescenes_tpu.parallel.mesh import eval_mesh
        self.mesh = eval_mesh()
        self._render = None
        self._render_sv = None

    def _build_render(self, h, w, v):
        sampler = ImageRaySampler(self.z_near, self.z_far, height=h, width=w)
        net = self.net
        cfg = self.cfg

        def render(variables, images, projs, poses, key):
            poses_r = geometry.rebase_poses_to_keyframe(poses)
            grid = net.apply(variables, images, projs, poses_r,
                             ids_encoder=[0], ids_render=[0],
                             method=BTSNet.encode)
            rays, _ = sampler.sample(None, None, poses_r, projs)

            def query_fn(xyz, coarse):
                return net.apply(variables, grid, xyz, coarse=coarse,
                                 method=BTSNet.query)

            out = renderer_lib.render_rays_chunked(query_fn, rays, key, cfg,
                                                   ray_chunk=16384,
                                                   mesh=self.mesh)
            render_dict = {"coarse": out["coarse"],
                           "fine": out.get("fine", dict(out["coarse"]))}
            render_dict = sampler.reconstruct(render_dict)
            for branch in ("coarse", "fine"):
                render_dict[branch]["depth"] = geometry.distance_to_z(
                    render_dict[branch]["depth"], projs)
            return render_dict

        return jax.jit(render)

    def _build_render_selfview(self, h, w):
        """Keyframe-only depth through the dense self-view query: rays from
        the encoder camera need no cross-view projection or gathers, and
        deterministic shared-z sampling turns the z-code into a (K, d)
        table (PERF.md findings 1/12)."""
        from behindthescenes_tpu.inference import render_depth_selfview
        net = self.net
        cfg = self.cfg

        def render(variables, images, projs, poses, key):
            poses_r = geometry.rebase_poses_to_keyframe(poses)
            grid = net.apply(variables, images, projs, poses_r,
                             ids_encoder=[0], ids_render=[0],
                             method=BTSNet.encode)
            depth, _, _ = render_depth_selfview(
                net, variables, grid, key, h, w, cfg, self.z_near,
                self.z_far, as_z_depth=True,
                deterministic=self._sv_deterministic)
            return depth                                # (1, h, w) z-depth

        return jax.jit(render)

    def evaluate(self, variables, batch, key=None) -> dict:
        """batch: numpy/jnp dict with imgs (1, v, h, w, 3), poses, projs,
        depths (1, 1, H0, W0). Returns metric dict (python floats)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        images = jnp.asarray(batch["imgs"])
        n, v, h, w, _ = images.shape
        assert n == 1, "evaluator is per-sample (reference parity)"
        if self.use_selfview and not self.eval_nvs:
            if self._render_sv is None or self._shape != (h, w, v):
                self._render_sv = self._build_render_selfview(h, w)
                self._shape = (h, w, v)
            depth = self._render_sv(variables, images,
                                    jnp.asarray(batch["projs"]),
                                    jnp.asarray(batch["poses"]), key)
            render_dict = {"fine": {"depth": depth[None]}}  # (1, 1, h, w)
        else:
            if self._render is None or self._shape != (h, w, v):
                self._render = self._build_render(h, w, v)
                self._shape = (h, w, v)
            render_dict = self._render(variables, images,
                                       jnp.asarray(batch["projs"]),
                                       jnp.asarray(batch["poses"]), key)

        out = {}
        out.update(self.compute_depth_metrics(
            np.asarray(render_dict["fine"]["depth"]),
            np.asarray(batch["depths"])))
        if self.eval_nvs:
            out.update(self.compute_nvs_metrics(render_dict, batch))
        return out

    # ------------------------------------------------------------- metrics
    def compute_depth_metrics(self, depth_pred_all, depth_gt_all) -> dict:
        """(reference evaluator.py:96-151)."""
        depth_gt = depth_gt_all[0, 0]                  # (H0, W0)
        if depth_gt.ndim == 3:
            depth_gt = depth_gt[0]
        depth_pred = depth_pred_all[0, 0]              # (h, w)

        gh, gw = depth_gt.shape
        ph, pw = depth_pred.shape
        if (ph, pw) != (gh, gw):
            ys = (np.arange(gh) * (ph / gh)).astype(np.int64)
            xs = (np.arange(gw) * (pw / gw)).astype(np.int64)
            depth_pred = depth_pred[ys][:, xs]

        mask = depth_gt > 0
        if self.depth_scaling == "median" and mask.any():
            scaling = np.median(depth_gt[mask]) / np.median(depth_pred[mask])
            depth_pred = depth_pred * scaling
        elif self.depth_scaling == "l2" and mask.any():
            dp = depth_pred[mask]
            a = np.stack([dp, np.ones_like(dp)], -1)
            x, *_ = np.linalg.lstsq(a, depth_gt[mask][:, None], rcond=None)
            depth_pred = depth_pred * x[0, 0] + x[1, 0]

        depth_pred = np.clip(depth_pred, 1e-3, 80.0)
        gt = depth_gt[mask]
        pred = depth_pred[mask]

        thresh = np.maximum(gt / pred, pred / gt)
        return {
            "abs_rel": float(np.mean(np.abs(gt - pred) / gt)),
            "sq_rel": float(np.mean((gt - pred) ** 2 / gt)),
            "rmse": float(np.sqrt(np.mean((gt - pred) ** 2))),
            "rmse_log": float(np.sqrt(np.mean(
                (np.log(gt) - np.log(pred)) ** 2))),
            "a1": float(np.mean(thresh < 1.25)),
            "a2": float(np.mean(thresh < 1.25 ** 2)),
            "a3": float(np.mean(thresh < 1.25 ** 3)),
        }

    def compute_nvs_metrics(self, render_dict, batch) -> dict:
        """(reference evaluator.py:153-187): 5% crop, stereo target frame."""
        rgb_gt = np.asarray(batch["imgs"]) * 0.5 + 0.5   # (1, v, h, w, 3)
        v = rgb_gt.shape[1]
        sf_id = v // 2
        gt = rgb_gt[0, sf_id]
        pred = np.asarray(render_dict["fine"]["rgb"])[0, sf_id]  # (h,w,vr,3)
        pred = pred.reshape(gt.shape[0], gt.shape[1], -1, 3).mean(-2)

        h, w = gt.shape[:2]
        y0, y1 = int(math.ceil(0.05 * h)), int(math.floor(0.95 * h))
        x0, x1 = int(math.ceil(0.05 * w)), int(math.floor(0.95 * w))
        gt = gt[y0:y1, x0:x1]
        pred = pred[y0:y1, x0:x1]

        out = {
            "ssim": M.ssim(pred, gt, data_range=1.0),
            "psnr": M.psnr(pred, gt, data_range=1.0),
        }
        if self.lpips is not None:
            out["lpips"] = self.lpips(pred, gt)
        return out
