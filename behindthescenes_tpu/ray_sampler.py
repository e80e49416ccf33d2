"""Ray samplers (reference models/bts/model/ray_sampler.py:7-321).

All samplers are pure: `sample(key, images, poses, projs)` -> (rays, rgb_gt)
with static output shapes, so they live inside the jitted train step. Patch
gathers are vectorized index arithmetic, not Python loops.

Layout: images are (n, v, h, w, c) NHWC; rays (n, R, 8); rgb_gt (n, R, c).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from behindthescenes_tpu import geometry


def _focals_centers(projs):
    """projs: (v, 3, 3) NDC intrinsics -> focal (v, 2), center (v, 2)."""
    focals = jnp.stack([projs[:, 0, 0], projs[:, 1, 1]], axis=-1)
    centers = jnp.stack([projs[:, 0, 2], projs[:, 1, 2]], axis=-1)
    return focals, centers


def _gen_all_rays(poses, projs, w, h, z_near, z_far, norm_dir=True):
    """(v, 4, 4), (v, 3, 3) -> (v, h, w, 8)."""
    focals, centers = _focals_centers(projs)
    return geometry.gen_rays(poses, w, h, z_near, z_far, focal=focals,
                             c=centers, norm_dir=norm_dir)


def _reshape_render_dict(render_dict, reshape_ray_dim, channels):
    """Apply `reshape_ray_dim` to every per-ray tensor of coarse/fine dicts.

    reshape_ray_dim(x, extra_dims) reshapes (n, n_pts, *extra) accordingly.
    """
    for branch_name in ("coarse", "fine"):
        branch = render_dict[branch_name]
        n, n_pts, v_c = branch["rgb"].shape
        v = v_c // channels
        out = dict(branch)
        out["rgb"] = reshape_ray_dim(branch["rgb"], (v, channels))
        out["depth"] = reshape_ray_dim(branch["depth"], ())
        n_smps = branch["weights"].shape[-1] if "weights" in branch else None
        if "weights" in branch:
            out["weights"] = reshape_ray_dim(branch["weights"], (n_smps,))
        k_inv = branch["invalid"].shape[-2]
        out["invalid"] = reshape_ray_dim(
            branch["invalid"], (k_inv, branch["invalid"].shape[-1]))
        if "alphas" in branch:
            out["alphas"] = reshape_ray_dim(
                branch["alphas"], (branch["alphas"].shape[-1],))
        if "z_samps" in branch:
            out["z_samps"] = reshape_ray_dim(
                branch["z_samps"], (branch["z_samps"].shape[-1],))
        if "rgb_samps" in branch:
            ns = branch["rgb_samps"].shape[-2]
            out["rgb_samps"] = reshape_ray_dim(
                branch["rgb_samps"], (ns, v, channels))
        render_dict[branch_name] = out
    return render_dict


@dataclasses.dataclass(frozen=True)
class RandomRaySampler:
    """Uniform random pixel rays (reference ray_sampler.py:15-106)."""
    ray_batch_size: int
    z_near: float
    z_far: float
    channels: int = 3

    def sample(self, key, images, poses, projs):
        n, v, h, w, c = images.shape
        keys = jax.random.split(key, n)

        def per_batch(key_i, imgs_i, poses_i, projs_i):
            rays = _gen_all_rays(poses_i, projs_i, w, h, self.z_near,
                                 self.z_far).reshape(-1, 8)
            rgb = imgs_i.reshape(-1, c)
            pix = jax.random.randint(key_i, (self.ray_batch_size,), 0,
                                     v * h * w)
            return rays[pix], rgb[pix]

        return jax.vmap(per_batch)(keys, images, poses, projs)

    def reconstruct(self, render_dict, channels: Optional[int] = None):
        channels = channels or self.channels

        def reshape(x, extra):
            n = x.shape[0]
            return x.reshape((n, self.ray_batch_size) + extra)

        render_dict = _reshape_render_dict(render_dict, reshape, channels)
        if "rgb_gt" in render_dict:
            n = render_dict["rgb_gt"].shape[0]
            render_dict["rgb_gt"] = render_dict["rgb_gt"].reshape(
                n, self.ray_batch_size, channels)
        return render_dict


@dataclasses.dataclass(frozen=True)
class PatchRaySampler:
    """Random p×p pixel patches — needed by SSIM / smoothness losses
    (reference ray_sampler.py:109-221)."""
    ray_batch_size: int
    z_near: float
    z_far: float
    patch_size: int | tuple = 8
    channels: int = 3

    @property
    def patch_size_yx(self):
        if isinstance(self.patch_size, int):
            return self.patch_size, self.patch_size
        return tuple(self.patch_size)

    @property
    def patch_count(self):
        py, px = self.patch_size_yx
        assert self.ray_batch_size % (py * px) == 0
        return self.ray_batch_size // (py * px)

    def sample(self, key, images, poses, projs):
        n, v, h, w, c = images.shape
        py, px = self.patch_size_yx
        pc = self.patch_count
        keys = jax.random.split(key, n)

        def per_batch(key_i, imgs_i, poses_i, projs_i):
            kv, ky, kx = jax.random.split(key_i, 3)
            rays = _gen_all_rays(poses_i, projs_i, w, h, self.z_near,
                                 self.z_far)  # (v, h, w, 8)
            vs = jax.random.randint(kv, (pc,), 0, v)
            ys = jax.random.randint(ky, (pc,), 0, h - py)
            xs = jax.random.randint(kx, (pc,), 0, w - px)
            # (pc, py, px) absolute pixel indices
            yy = ys[:, None, None] + jnp.arange(py)[None, :, None]
            xx = xs[:, None, None] + jnp.arange(px)[None, None, :]
            vv = jnp.broadcast_to(vs[:, None, None], (pc, py, px))
            rays_p = rays[vv, yy, xx]              # (pc, py, px, 8)
            rgb_p = imgs_i[vv, yy, xx]             # (pc, py, px, c)
            return rays_p.reshape(-1, 8), rgb_p.reshape(-1, c)

        return jax.vmap(per_batch)(keys, images, poses, projs)

    def reconstruct(self, render_dict, channels: Optional[int] = None):
        channels = channels or self.channels
        py, px = self.patch_size_yx
        pc = self.patch_count

        def reshape(x, extra):
            n = x.shape[0]
            return x.reshape((n, pc, py, px) + extra)

        render_dict = _reshape_render_dict(render_dict, reshape, channels)
        if "rgb_gt" in render_dict:
            n = render_dict["rgb_gt"].shape[0]
            render_dict["rgb_gt"] = render_dict["rgb_gt"].reshape(
                n, pc, py, px, channels)
        return render_dict


@dataclasses.dataclass(frozen=True)
class ImageRaySampler:
    """All rays of all views (reference ray_sampler.py:224-321)."""
    z_near: float
    z_far: float
    height: Optional[int] = None
    width: Optional[int] = None
    channels: int = 3
    norm_dir: bool = True

    def sample(self, key, images, poses, projs):
        del key  # deterministic
        n, v = poses.shape[:2]
        if images is not None:
            h, w = images.shape[2:4]
        else:
            h, w = self.height, self.width
        h = self.height or h
        w = self.width or w

        def per_batch(poses_i, projs_i):
            rays = _gen_all_rays(poses_i, projs_i, w, h, self.z_near,
                                 self.z_far, norm_dir=self.norm_dir)
            return rays.reshape(-1, 8)

        all_rays = jax.vmap(per_batch)(poses, projs)
        all_rgb_gt = None
        if images is not None:
            all_rgb_gt = images.reshape(n, v * h * w, images.shape[-1])
        return all_rays, all_rgb_gt

    def reconstruct(self, render_dict, channels: Optional[int] = None,
                    height: Optional[int] = None, width: Optional[int] = None):
        channels = channels or self.channels
        h = height or self.height
        w = width or self.width
        n, n_pts, _ = render_dict["coarse"]["rgb"].shape
        v_in = n_pts // (h * w)

        def reshape(x, extra):
            return x.reshape((n, v_in, h, w) + extra)

        render_dict = _reshape_render_dict(render_dict, reshape, channels)
        if "rgb_gt" in render_dict and render_dict["rgb_gt"] is not None:
            render_dict["rgb_gt"] = render_dict["rgb_gt"].reshape(
                n, v_in, h, w, channels)
        return render_dict


def make_ray_sampler(sample_mode: str, ray_batch_size: int, z_near, z_far,
                     patch_size=8, channels: int = 3):
    """Sampler factory (reference models/bts/trainer.py:64-71)."""
    if sample_mode == "random":
        return RandomRaySampler(ray_batch_size, z_near, z_far, channels)
    if sample_mode == "patch":
        return PatchRaySampler(ray_batch_size, z_near, z_far, patch_size,
                               channels)
    if sample_mode == "image":
        return ImageRaySampler(z_near, z_far, channels=channels)
    raise NotImplementedError(sample_mode)
