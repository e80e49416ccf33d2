"""Remaining layer-zoo ops from the reference's layer library.

Mirrors models/common/model/layers.py: Backprojection (:44-63),
point_projection (:66-72), the residual-image warp (:153-225), PadSameConv2d
(:228-258), PadSameConv2dTransposed (:261-297), ConvReLU2 (:300-327),
ConvReLU (:330-346), Upconv (:349-367), ConvSig (:370-387), Refine
(:390-410).  None of these are used by the shipped BTS configs (the BTS
render path has its own projection in geometry.py); they complete the layer
surface for the reference's other model families.

TPU-first conventions: NHWC tensors, points as (n, p, d) rows (channel-last
so per-point math stays on VPU lanes), functional ops where the reference is
stateless, flax modules where there are weights.

Note: the reference's ResidualImageModule (layers.py:166-225) is dead code
upstream — it constructs `Backprojection(n, h, w)` (swapped arguments) and
reads a nonexistent `.pix_coords` attribute, so calling it raises.
`residual_image` here implements the intended semantics (min-SSIM residual
over warped source frames with zero-sample masking).
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from behindthescenes_tpu import geometry
from behindthescenes_tpu.ops.grid_sample import grid_sample_2d
from behindthescenes_tpu.ops.ssim import ssim


def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


# ------------------------------------------------------------------ projection
def ndc_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous NDC pixel grid [x, y, 1] — (h*w, 3)
    (reference layers.py:50-55: linspace(-1, 1) inclusive)."""
    yy = jnp.linspace(-1.0, 1.0, h, dtype=dtype)
    xx = jnp.linspace(-1.0, 1.0, w, dtype=dtype)
    gx, gy = jnp.meshgrid(xx, yy)          # (h, w)
    return jnp.stack([gx.reshape(-1), gy.reshape(-1),
                      jnp.ones(h * w, dtype=dtype)], axis=-1)


def backproject(depth: jnp.ndarray, inv_k: jnp.ndarray) -> jnp.ndarray:
    """Lift a depth map to homogeneous camera points
    (reference Backprojection, layers.py:44-63).

    Args:
      depth: (n, h, w) or (n, h, w, 1).
      inv_k: (n, 3, 3) inverse NDC intrinsics.
    Returns:
      (n, h*w, 4) homogeneous camera-space points.
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    n, h, w = depth.shape
    coord = ndc_grid(h, w, depth.dtype)                       # (p, 3)
    # Unrolled mat-vec (see geometry.project_points: 3-wide einsum pads to
    # 128 MXU lanes; elementwise is exact f32 and fuses).
    cam = [inv_k[:, None, i, 0] * coord[None, :, 0]
           + inv_k[:, None, i, 1] * coord[None, :, 1]
           + inv_k[:, None, i, 2] for i in range(3)]
    d = depth.reshape(n, h * w)
    return jnp.stack([cam[0] * d, cam[1] * d, cam[2] * d,
                      jnp.ones_like(d)], axis=-1)


def point_projection(points: jnp.ndarray, k: jnp.ndarray,
                     t: jnp.ndarray, eps: float = 1e-7):
    """Project homogeneous points through pose `t` and intrinsics `k`
    (reference layers.py:66-72).

    Args:
      points: (n, p, 4) homogeneous points.
      k: (n, 3, 3) NDC intrinsics (padded to (n, 3or4, 4) upstream in the
        reference; only the 3x3 block matters).
      t: (n, 4, 4) transform applied before projection.
    Returns:
      img_xy: (n, p, 2) normalized coords; z: (n, p) camera depth.
    """
    kt = jnp.einsum("nij,njk->nik", k[:, :3, :3], t[:, :3, :],
                    precision="highest")                      # (n, 3, 4)
    cam = [sum(kt[:, None, i, j] * points[..., j] for j in range(4))
           for i in range(3)]
    z = cam[2]
    return jnp.stack([cam[0], cam[1]], axis=-1) / (z + eps)[..., None], z


def residual_image(keyframe: jnp.ndarray, keyframe_pose: jnp.ndarray,
                   keyframe_k: jnp.ndarray, inv_depth: jnp.ndarray,
                   frames: Sequence[jnp.ndarray],
                   poses: Sequence[jnp.ndarray],
                   intrinsics: Sequence[jnp.ndarray],
                   inv_depth_min: float = 1.0,
                   inv_depth_max: float = 0.0) -> jnp.ndarray:
    """Min-SSIM residual between the keyframe and source frames warped into
    it through a predicted depth (intended semantics of reference
    ResidualImageModule, layers.py:166-225 — see module docstring).

    Args:
      keyframe: (n, h, w, 3) in [-1, 1]; frames likewise.
      keyframe_pose / poses[i]: (n, 4, 4) camera-to-world.
      keyframe_k / intrinsics[i]: (n, 3, 3) NDC intrinsics.
      inv_depth: (n, h, w, 1) prediction in [0, 1], mapped to inverse depth
        by lerp(inv_depth_max, inv_depth_min) as the reference does.
    Returns:
      (n, h, w, 1) residual, 0 where no source frame sees the pixel.
    """
    n, h, w, _ = keyframe.shape
    invd = ((1.0 - inv_depth) * inv_depth_max
            + inv_depth * inv_depth_min)[..., 0]              # (n, h, w)
    depth = 1.0 / jnp.maximum(invd, 1e-7)
    cam = backproject(depth, jnp.linalg.inv(keyframe_k))      # (n, p, 4)

    residuals, masks = [], []
    for img, pose, k in zip(frames, poses, intrinsics):
        t = jnp.einsum("nij,njk->nik", geometry.invert_pose(pose),
                       keyframe_pose, precision="highest")
        xy, _ = point_projection(cam, k, t)
        # reference: grid_sample(image + 1) with zero padding, then a sample
        # is "unseen" if any channel is exactly 0.  align_corners=True keeps
        # the linspace(-1, 1) NDC grid self-consistent (identity pose
        # round-trips exactly); the upstream module never runs, so there is
        # no behavior to match on this point.
        warped = grid_sample_2d(img + 1.0, xy, align_corners=True,
                                padding_mode="zeros")
        mask = jnp.any(warped == 0.0, axis=-1, keepdims=True)  # (n, p, 1)
        warped = (warped - 0.5).reshape(n, h, w, 3)
        res = ssim(warped, keyframe + 0.5)                     # (n, h, w, 3)
        res = jnp.mean(res, axis=-1, keepdims=True)
        res = jnp.where(mask.reshape(n, h, w, 1), jnp.inf, res)
        residuals.append(res)
        masks.append(mask.reshape(n, h, w, 1))
    residual = jnp.min(jnp.stack(residuals), axis=0)
    unseen_everywhere = jnp.all(jnp.stack(masks), axis=0)
    return jnp.where(unseen_everywhere, 0.0, residual)


# ---------------------------------------------------------------- pad-same ops
def pad_same(x: jnp.ndarray, kernel_size, stride=1) -> jnp.ndarray:
    """Tensorflow-style "same" padding for a VALID conv, NHWC
    (reference PadSameConv2d, layers.py:228-258; negative pads crop,
    matching F.pad)."""
    ky, kx = _pair(kernel_size)
    sy, sx = _pair(stride)
    _, h, w, _ = x.shape
    py = (sy * (math.ceil(h / sy) - 1) + ky - h) / 2
    px = (sx * (math.ceil(w / sx) - 1) + kx - w) / 2
    lo_y, hi_y = math.floor(py), math.ceil(py)
    lo_x, hi_x = math.floor(px), math.ceil(px)
    x = x[:, max(0, -lo_y):x.shape[1] - max(0, -hi_y),
          max(0, -lo_x):x.shape[2] - max(0, -hi_x)]
    return jnp.pad(x, ((0, 0), (max(0, lo_y), max(0, hi_y)),
                       (max(0, lo_x), max(0, hi_x)), (0, 0)))


def pad_same_transposed(x: jnp.ndarray, orig_hw, stride=2) -> jnp.ndarray:
    """Pad/crop a transposed-conv output to exactly `orig_hw * stride`
    (reference PadSameConv2dTransposed, layers.py:261-297)."""
    sy, sx = _pair(stride)
    th, tw = orig_hw[0] * sy, orig_hw[1] * sx
    oy, ox = th - x.shape[1], tw - x.shape[2]

    def fix(arr, axis, over):
        if over > 0:
            cfg = [(0, 0)] * 4
            cfg[axis] = (math.floor(over / 2), math.ceil(over / 2))
            return jnp.pad(arr, cfg)
        if over < 0:
            lo = math.floor(-over / 2)
            hi = arr.shape[axis] - math.ceil(-over / 2)
            return jax.lax.slice_in_dim(arr, lo, hi, axis=axis)
        return arr

    return fix(fix(x, 1, oy), 2, ox)


# -------------------------------------------------------------- weight layers
class ConvReLU(nn.Module):
    """pad_same + conv + leaky-relu (reference layers.py:330-346)."""
    features: int
    kernel_size: int
    stride: int = 1
    neg_slope: float = 0.1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = pad_same(x, self.kernel_size, self.stride)
        x = nn.Conv(self.features, _pair(self.kernel_size),
                    strides=_pair(self.stride), padding="VALID",
                    dtype=self.compute_dtype, name="conv")(x)
        return nn.leaky_relu(x, self.neg_slope)


class ConvReLU2(nn.Module):
    """Separable y-then-x convs, each followed by leaky-relu
    (reference layers.py:300-327)."""
    features: int
    kernel_size: int
    stride: int = 1
    neg_slope: float = 0.1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        x = pad_same(x, (k, 1), (s, 1))
        x = nn.Conv(self.features, (k, 1), strides=(s, 1), padding="VALID",
                    dtype=self.compute_dtype, name="conv_y")(x)
        x = nn.leaky_relu(x, self.neg_slope)
        x = pad_same(x, (1, k), (1, s))
        x = nn.Conv(self.features, (1, k), strides=(1, s), padding="VALID",
                    dtype=self.compute_dtype, name="conv_x")(x)
        return nn.leaky_relu(x, self.neg_slope)


class Upconv(nn.Module):
    """2x nearest upsample + 2x2 same conv (reference layers.py:349-367)."""
    features: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (n, h, 2, w, 2, c)).reshape(n, h * 2, w * 2, c)
        x = pad_same(x, 2)
        return nn.Conv(self.features, (2, 2), padding="VALID",
                       dtype=self.compute_dtype, name="conv")(x)


class ConvSig(nn.Module):
    """pad_same + conv + sigmoid (reference layers.py:370-387)."""
    features: int
    kernel_size: int
    stride: int = 1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = pad_same(x, self.kernel_size, self.stride)
        x = nn.Conv(self.features, _pair(self.kernel_size),
                    strides=_pair(self.stride), padding="VALID",
                    dtype=self.compute_dtype, name="conv")(x)
        return nn.sigmoid(x)


class Refine(nn.Module):
    """4x4 stride-2 transposed conv + leaky-relu, padded to exactly 2x the
    input size, with optional skip concat (reference layers.py:390-410)."""
    features: int
    neg_slope: float = 0.1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, features_direct: Optional[jnp.ndarray] = None):
        orig_hw = x.shape[1:3]
        x = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                             padding="VALID", dtype=self.compute_dtype,
                             name="conv2d_t")(x)
        x = nn.leaky_relu(x, self.neg_slope)
        x = pad_same_transposed(x, orig_hw, 2)
        if features_direct is not None:
            x = jnp.concatenate([x, features_direct], axis=-1)
        return x
