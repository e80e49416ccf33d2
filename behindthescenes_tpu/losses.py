"""Self-supervised reconstruction loss (reference models/bts/model/loss.py).

Pure function of the render dict; every branch (criterion, invalid policy,
regularizers) mirrors the reference's semantics, including the Monodepth2-style
minimum over reconstructed views (loss.py:154-155) and the median
thresholding implemented as a masked mean (dynamic boolean indexing is not
jit-able; sum(loss*mask)/sum(mask) is numerically identical).
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from behindthescenes_tpu.ops.ssim import ssim


def compute_errors_l1ssim(img0, img1):
    """0.85*SSIM + 0.15*L1 (reference loss.py:10-18).

    img0: (n, pc, h, w, nv, c); img1: broadcastable (n, pc, h, w, 1, c).
    Returns (n, pc, h, w, nv, 1).
    """
    n, pc, h, w, nv, c = img0.shape
    img1 = jnp.broadcast_to(img1, img0.shape)
    a = img0.transpose(0, 1, 4, 2, 3, 5).reshape(-1, h, w, c)
    b = img1.transpose(0, 1, 4, 2, 3, 5).reshape(-1, h, w, c)
    s = ssim(a, b, pad_reflection=False, gaussian_average=True,
             comp_mode=True)
    err = 0.85 * jnp.mean(s, axis=-1) + 0.15 * jnp.mean(jnp.abs(a - b),
                                                        axis=-1)
    return err.reshape(n, pc, nv, h, w).transpose(0, 1, 3, 4, 2)[..., None]


def edge_aware_smoothness(gt_img, depth):
    """Disparity smoothness weighted by image gradients
    (reference loss.py:21-40).

    gt_img: (n, pc, h', w', nv, 3); depth: (n, pc, h, w).
    Returns (n, pc, h, w).
    """
    n, pc, h, w = depth.shape
    img = gt_img[..., 0, :] if gt_img.ndim == 6 else gt_img  # (n,pc,h',w',3)
    if img.shape[2:4] != (h, w):
        ys = (jnp.arange(h) * (img.shape[2] / h)).astype(jnp.int32)
        xs = (jnp.arange(w) * (img.shape[3] / w)).astype(jnp.int32)
        img = img[:, :, ys][:, :, :, xs]
    disp = 1.0 / jnp.clip(depth, 1e-3, 80.0)
    disp = disp / jnp.mean(disp, axis=(-2, -1), keepdims=True)

    d_dx = jnp.abs(disp[..., :, :-1] - disp[..., :, 1:])
    d_dy = jnp.abs(disp[..., :-1, :] - disp[..., 1:, :])
    i_dx = jnp.mean(jnp.abs(img[..., :, :-1, :] - img[..., :, 1:, :]), -1)
    i_dy = jnp.mean(jnp.abs(img[..., :-1, :, :] - img[..., 1:, :, :]), -1)
    d_dx = d_dx * jnp.exp(-i_dx)
    d_dy = d_dy * jnp.exp(-i_dy)
    err = (jnp.pad(d_dx, [(0, 0), (0, 0), (0, 0), (0, 1)])
           + jnp.pad(d_dy, [(0, 0), (0, 0), (0, 1), (0, 0)]))
    return err


def _masked_mean(x, keep_mask):
    total = jnp.sum(keep_mask)
    return jnp.sum(x * keep_mask) / jnp.maximum(total, 1.0)


@dataclasses.dataclass(frozen=True)
class ReconstructionLoss:
    """Mirrors reference ReconstructionLoss (loss.py:43-293)."""
    criterion: str = "l2"
    invalid_policy: str = "strict"
    lambda_coarse: float = 1.0
    lambda_fine: float = 1.0
    lambda_entropy: float = 0.0
    lambda_depth_reg: float = 0.0
    lambda_alpha_reg: float = 0.0
    lambda_surfaceness_reg: float = 0.0
    lambda_edge_aware_smoothness: float = 0.0
    lambda_depth_smoothness: float = 0.0
    median_thresholding: bool = False
    alpha_reg_reduction: str = "ray"
    alpha_reg_fraction: float = 1.0 / 8
    use_automasking: bool = False

    @classmethod
    def from_conf(cls, conf: dict, use_automasking: bool = False):
        return cls(
            criterion=conf.get("criterion", "l2"),
            invalid_policy=conf.get("invalid_policy", "strict"),
            lambda_coarse=conf.get("lambda_coarse", 1),
            lambda_fine=conf.get("lambda_fine", 1),
            lambda_entropy=conf.get("lambda_entropy", 0),
            lambda_depth_reg=conf.get("lambda_depth_reg", 0),
            lambda_alpha_reg=conf.get("lambda_alpha_reg", 0),
            lambda_surfaceness_reg=conf.get("lambda_surfaceness_reg", 0),
            lambda_edge_aware_smoothness=conf.get(
                "lambda_edge_aware_smoothness", 0),
            lambda_depth_smoothness=conf.get("lambda_depth_smoothness", 0),
            median_thresholding=conf.get("median_thresholding", False),
            alpha_reg_reduction=conf.get("alpha_reg_reduction", "ray"),
            alpha_reg_fraction=conf.get("alpha_reg_fraction", 1 / 8),
            use_automasking=use_automasking,
        )

    @property
    def ignore_invalid(self) -> bool:
        return self.invalid_policy not in (None, "none")

    def _crit(self, pred, gt):
        if self.criterion == "l2":
            return (pred - gt) ** 2
        if self.criterion == "l1":
            return jnp.abs(pred - gt)
        if self.criterion == "l1+ssim":
            return compute_errors_l1ssim(pred, gt)
        raise NotImplementedError(self.criterion)

    def _invalid_mask(self, branch):
        """Per-ray invalid indicator (n, pc, h, w, 1) float-compatible."""
        invalid = branch["invalid"]
        if self.invalid_policy == "strict":
            return jnp.all(jnp.any(invalid > 0.5, axis=-2), axis=-1,
                           keepdims=True)
        if self.invalid_policy == "weight_guided":
            weights = branch["weights"]
            mass = jnp.sum(invalid.astype(jnp.float32)
                           * weights[..., None], axis=-2)
            return jnp.all(mass > 0.9, axis=-1, keepdims=True)
        if self.invalid_policy == "weight_guided_diverse":
            weights = branch["weights"]
            rgb_samps = branch["rgb_samps"]
            ray_std = jnp.std(rgb_samps, axis=-3).mean(-1)
            mass = jnp.sum(invalid.astype(jnp.float32)
                           * weights[..., None], axis=-2)
            return jnp.all((mass > 0.9) | (ray_std < 0.01), axis=-1,
                           keepdims=True)
        if self.invalid_policy in (None, "none"):
            shape = invalid.shape[:-2] + (1,)
            return jnp.zeros(shape, dtype=bool)
        raise NotImplementedError(self.invalid_policy)

    def __call__(self, data):
        """data: dict with "coarse"/"fine" per-scale lists (reconstructed
        shapes (n, pc, h, w, ...)) and "rgb_gt" (n, pc, h, w, c).

        Returns (total_loss scalar, dict of scalar diagnostics).
        """
        # jax.named_scope("loss_computation") analogue of the reference's
        # record_function scopes is applied by the caller's train step.
        n_scales = len(data["coarse"])
        coarse_0 = data["coarse"][0]
        fine_0 = data["fine"][0]
        invalid_coarse = self._invalid_mask(coarse_0)
        invalid_fine = self._invalid_mask(fine_0)

        loss = 0.0
        loss_coarse_all = 0.0
        loss_fine_all = 0.0
        loss_depth_reg = 0.0
        loss_alpha_reg = 0.0
        loss_surfaceness_reg = 0.0
        loss_eas = 0.0
        loss_depth_smoothness = 0.0

        for scale in range(n_scales):
            coarse = data["coarse"][scale]
            fine = data["fine"][scale]
            rgb_coarse = coarse["rgb"]
            rgb_fine = fine["rgb"]
            rgb_gt = data["rgb_gt"]

            thresh_gt = None
            if self.use_automasking:
                thresh_gt = rgb_gt[..., -1:]
                rgb_coarse = rgb_coarse[..., :-1]
                rgb_fine = rgb_fine[..., :-1]
                rgb_gt = rgb_gt[..., :-1]

            rgb_gt_b = rgb_gt[..., None, :]  # (n, pc, h, w, 1, c)
            b = rgb_coarse.shape[0]

            def scale_rgb_loss(rgb_pred, invalid_ray):
                rl = self._crit(rgb_pred, rgb_gt_b)     # (n,pc,h,w,nv,c|1)
                rl = jnp.min(rl, axis=-2)               # min over views
                if self.use_automasking:
                    rl = jnp.minimum(rl, thresh_gt)
                if self.ignore_invalid:
                    rl = rl * (1.0 - invalid_ray.astype(rl.dtype))
                if self.median_thresholding:
                    thr = jnp.median(rl.reshape(b, -1), axis=-1)
                    keep = (rl <= thr.reshape((-1,) + (1,) * (rl.ndim - 1)))
                    return _masked_mean(rl, keep.astype(rl.dtype))
                return jnp.mean(rl)

            rgb_loss = scale_rgb_loss(rgb_coarse, invalid_coarse)
            loss_coarse_all = loss_coarse_all + rgb_loss * self.lambda_coarse

            using_fine = len(fine) > 0
            if using_fine:
                fine_loss = scale_rgb_loss(rgb_fine, invalid_fine)
                loss_fine_all = loss_fine_all + fine_loss * self.lambda_fine
                rgb_loss = (rgb_loss * self.lambda_coarse
                            + fine_loss * self.lambda_fine)
            loss = loss + rgb_loss

            depths = coarse["depth"]
            if self.lambda_depth_reg > 0:
                diffs_x = depths[:, :, 1:, :] - depths[:, :, :-1, :]
                diffs_y = depths[:, :, :, 1:] - depths[:, :, :, :-1]
                l = jnp.mean(diffs_x ** 2) + jnp.mean(diffs_y ** 2)
                loss_depth_reg = loss_depth_reg + l
                loss = loss + l * self.lambda_depth_reg

            if self.lambda_alpha_reg > 0:
                alphas = coarse["alphas"]
                n_smps = alphas.shape[-1]
                alpha_sum = jnp.sum(alphas[..., :-1], axis=-1)
                min_cap = jnp.full_like(alpha_sum,
                                        n_smps * self.alpha_reg_fraction)
                if self.ignore_invalid:
                    valid = 1.0 - invalid_coarse[..., 0].astype(
                        alpha_sum.dtype)
                    alpha_sum = alpha_sum * valid
                    min_cap = min_cap * valid
                if self.alpha_reg_reduction == "ray":
                    l = jnp.maximum(alpha_sum - min_cap, 0.0)
                elif self.alpha_reg_reduction == "slice":
                    l = jnp.maximum(
                        jnp.sum(alpha_sum, -1) - jnp.sum(min_cap, -1),
                        0.0) / alpha_sum.shape[-1]
                else:
                    raise ValueError(self.alpha_reg_reduction)
                l = jnp.mean(l)
                loss_alpha_reg = loss_alpha_reg + l
                loss = loss + l * self.lambda_alpha_reg

            if self.lambda_surfaceness_reg > 0:
                alphas = coarse["alphas"]
                p = -jnp.log(jnp.exp(-jnp.abs(alphas))
                             + jnp.exp(-jnp.abs(1.0 - alphas)))
                p = jnp.mean(p, axis=-1)
                if self.ignore_invalid:
                    p = p * (1.0 - invalid_coarse[..., 0].astype(p.dtype))
                l = jnp.mean(p)
                loss_surfaceness_reg = loss_surfaceness_reg + l
                loss = loss + l * self.lambda_surfaceness_reg

            if self.lambda_edge_aware_smoothness > 0:
                l_map = edge_aware_smoothness(rgb_gt_b, depths)
                if self.ignore_invalid:
                    inv = invalid_coarse[..., 0].astype(l_map.dtype)
                    if inv.shape[-2:] != l_map.shape[-2:]:
                        ys = (jnp.arange(l_map.shape[-2])
                              * (inv.shape[-2] / l_map.shape[-2])).astype(int)
                        xs = (jnp.arange(l_map.shape[-1])
                              * (inv.shape[-1] / l_map.shape[-1])).astype(int)
                        inv = inv[..., ys, :][..., xs]
                    l_map = l_map * (1.0 - jnp.ceil(inv))
                l = jnp.mean(l_map)
                loss_eas = loss_eas + l
                loss = loss + (l * self.lambda_edge_aware_smoothness
                               / (2 ** scale))

            if self.lambda_depth_smoothness > 0:
                l = (jnp.mean((depths[..., :-1, :] - depths[..., 1:, :]) ** 2)
                     + jnp.mean((depths[..., :, :-1]
                                 - depths[..., :, 1:]) ** 2))
                loss_depth_smoothness = loss_depth_smoothness + l
                loss = loss + l * self.lambda_depth_smoothness

        loss = loss / n_scales

        loss_ray_entropy = jnp.asarray(0.0)
        if self.lambda_entropy > 0:
            alphas = coarse_0["alphas"] + 1e-5
            ray_density = alphas / jnp.sum(alphas, axis=-1, keepdims=True)
            ray_entropy = -jnp.sum(
                ray_density * jnp.log(ray_density), axis=-1) \
                / math.log2(alphas.shape[-1])
            ray_entropy = ray_entropy * (
                1.0 - invalid_coarse[..., 0].astype(ray_entropy.dtype))
            loss_ray_entropy = jnp.mean(ray_entropy)
        loss = loss + loss_ray_entropy * self.lambda_entropy

        loss_dict = {
            "loss_rgb_coarse": loss_coarse_all,
            "loss_rgb_fine": loss_fine_all,
            "loss_ray_entropy": loss_ray_entropy,
            "loss_depth_reg": loss_depth_reg,
            "loss_alpha_reg": loss_alpha_reg,
            "loss_eas": loss_eas,
            "loss_depth_smoothness": loss_depth_smoothness,
            "loss_invalid_ratio": jnp.mean(
                invalid_coarse.astype(jnp.float32)),
            "loss": loss,
        }
        return loss, loss_dict
