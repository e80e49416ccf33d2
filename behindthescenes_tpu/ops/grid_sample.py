"""Bilinear grid sampling with exact torch `F.grid_sample` semantics.

The reference's per-point hot path samples pixel-aligned feature maps and
colors with `F.grid_sample(mode="bilinear", padding_mode="border",
align_corners=False)` (reference models/bts/model/models_bts.py:179,234) and
the KITTI-360 fisheye resampler uses `align_corners=True`
(kitti_360_dataset.py:68). Both variants are implemented here, channel-last
(NHWC) as is natural on TPU, as gathers that XLA fuses with the surrounding
projection / MLP math.
"""
from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample_2d(image: jnp.ndarray, coords: jnp.ndarray, *,
                   align_corners: bool = False,
                   padding_mode: str = "border",
                   mode: str = "bilinear") -> jnp.ndarray:
    """Sample `image` at normalized coords in [-1, 1].

    Args:
      image: (..., H, W, C) channel-last feature map.
      coords: (..., P, 2) normalized (x, y); batch dims must match image's.
      padding_mode: "border" or "zeros".
      mode: "bilinear" or "nearest".
    Returns:
      (..., P, C) sampled values.
    """
    if padding_mode not in ("border", "zeros"):
        raise NotImplementedError(padding_mode)
    h, w = image.shape[-3], image.shape[-2]
    x = _unnormalize(coords[..., 0], w, align_corners)
    y = _unnormalize(coords[..., 1], h, align_corners)

    if mode == "nearest":
        # torch rounds half away from floor via round-to-nearest-even on the
        # unnormalized coord; jnp.round matches for the generic case.
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        inb = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        ixc = jnp.clip(ix, 0, w - 1)
        iyc = jnp.clip(iy, 0, h - 1)
        out = jnp.take_along_axis(
            image.reshape(image.shape[:-3] + (h * w, image.shape[-1])),
            (iyc * w + ixc)[..., None],
            axis=-2,
        )
        if padding_mode == "zeros":
            out = jnp.where(inb[..., None], out, 0.0)
        return out
    if mode != "bilinear":
        raise NotImplementedError(mode)

    if padding_mode == "border":
        # torch clips the source coordinate itself before computing corners.
        x = jnp.clip(x, 0.0, w - 1)
        y = jnp.clip(y, 0.0, h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    def corner_ok(ix, iy):
        return (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)

    flat = image.reshape(image.shape[:-3] + (h * w, image.shape[-1]))

    def fetch(ix, iy):
        ixc = jnp.clip(ix, 0, w - 1)
        iyc = jnp.clip(iy, 0, h - 1)
        return jnp.take_along_axis(flat, (iyc * w + ixc)[..., None], axis=-2)

    v00 = fetch(ix0, iy0)
    v01 = fetch(ix1, iy0)
    v10 = fetch(ix0, iy1)
    v11 = fetch(ix1, iy1)

    w00 = wx0 * wy0
    w01 = wx1 * wy0
    w10 = wx0 * wy1
    w11 = wx1 * wy1
    if padding_mode == "zeros":
        w00 = jnp.where(corner_ok(ix0, iy0), w00, 0.0)
        w01 = jnp.where(corner_ok(ix1, iy0), w01, 0.0)
        w10 = jnp.where(corner_ok(ix0, iy1), w10, 0.0)
        w11 = jnp.where(corner_ok(ix1, iy1), w11, 0.0)

    return (v00 * w00[..., None] + v01 * w01[..., None]
            + v10 * w10[..., None] + v11 * w11[..., None])
