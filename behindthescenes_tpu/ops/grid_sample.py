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

import jax
import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _row_gather(image, iy, ix):
    """Gather pixel ROWS (all channels) by integer coords.

    image: (..., H, W, C); iy/ix: (..., P) int32 in-bounds.
    Uses a flat row gather (jnp.take along axis 0) — one index per pixel —
    instead of take_along_axis with a broadcast channel index, which XLA
    lowers to per-ELEMENT gathers (C times the index traffic; ~30x slower
    on TPU for C=64).
    """
    h, w, c = image.shape[-3:]
    batch_shape = image.shape[:-3]
    b = 1
    for s in batch_shape:
        b *= s
    flat = image.reshape(b * h * w, c)
    idx = (iy * w + ix).reshape(b, -1)
    offsets = (jnp.arange(b, dtype=idx.dtype) * (h * w))[:, None]
    rows = jnp.take(flat, (idx + offsets).reshape(-1), axis=0)
    return rows.reshape(batch_shape + (iy.shape[-1], c))


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
        out = _row_gather(image, iyc, ixc)
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

    def fetch(ix, iy):
        ixc = jnp.clip(ix, 0, w - 1)
        iyc = jnp.clip(iy, 0, h - 1)
        return _row_gather(image, iyc, ixc)

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


def pack_corners(image: jnp.ndarray) -> jnp.ndarray:
    """Pack each pixel's 4 bilinear corners into channels:
    out[y, x] = [I[y,x], I[y,x+1], I[y+1,x], I[y+1,x+1]] with edge clamping.

    For narrow-channel images (e.g. RGB), gathering ONE 4C-wide row per
    point beats four 3-float row gathers (row-gather cost is per-row, not
    per-byte, at these widths).

    image: (..., H, W, C) -> (..., H, W, 4C).
    """
    right = jnp.concatenate([image[..., :, 1:, :], image[..., :, -1:, :]],
                            axis=-2)
    down = jnp.concatenate([image[..., 1:, :, :], image[..., -1:, :, :]],
                           axis=-3)
    down_right = jnp.concatenate([right[..., 1:, :, :],
                                  right[..., -1:, :, :]], axis=-3)
    return jnp.concatenate([image, right, down, down_right], axis=-1)


def pack_corners_x(image: jnp.ndarray) -> jnp.ndarray:
    """Pack each pixel's x-neighbor pair into channels:
    out[y, x] = [I[y,x], I[y,x+1]] with edge clamping.

    For WIDE-channel maps (C > 32) the 4-corner pack of `pack_corners`
    produces gather rows wider than 128 elements, which hit a ~6x slower
    TPU gather path (measured: 256-element bf16 rows gather at ~41 GB/s,
    128-element rows at ~112 GB/s — PERF.md). Packing only the x-pair keeps
    rows at 2C elements and fetches the y-pair with a second row gather:
    two fast gathers beat one slow one by ~2x end-to-end.

    image: (..., H, W, C) -> (..., H, W, 2C).
    """
    right = jnp.concatenate([image[..., :, 1:, :], image[..., :, -1:, :]],
                            axis=-2)
    return jnp.concatenate([image, right], axis=-1)


def grid_sample_2d_xpair(packed: jnp.ndarray, coords: jnp.ndarray, *,
                         align_corners: bool = False) -> jnp.ndarray:
    """Bilinear sample from an x-pair packed map (see `pack_corners_x`) with
    border padding semantics — exactly grid_sample_2d(..., "border",
    "bilinear") up to interpolation dtype, using two row gathers per point
    (rows y0 and y1).

    Interpolation runs in the packed dtype: for bf16 maps the bf16 lerp
    weights add error of the same order as the bf16 corner storage itself
    (2^-8 relative), and avoiding f32 intermediates keeps the consumer
    fused (measured 1.9 vs 2.8 ms per 245k x 64ch points).

    packed: (..., H, W, 2C); coords: (..., P, 2) -> (..., P, C).
    """
    h, w = packed.shape[-3], packed.shape[-2]
    c = packed.shape[-1] // 2
    x = _unnormalize(coords[..., 0], w, align_corners)
    y = _unnormalize(coords[..., 1], h, align_corners)
    x = jnp.clip(x, 0.0, w - 1)
    y = jnp.clip(y, 0.0, h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    iy1 = jnp.minimum(iy0 + 1, h - 1)
    dt = packed.dtype
    wx1 = (x - x0).astype(dt)[..., None]
    wy1 = (y - y0).astype(dt)[..., None]
    rows0 = _row_gather(packed, iy0, ix0)
    rows1 = _row_gather(packed, iy1, ix0)
    top = rows0[..., :c] * (1 - wx1) + rows0[..., c:] * wx1
    bot = rows1[..., :c] * (1 - wx1) + rows1[..., c:] * wx1
    return top * (1 - wy1) + bot * wy1


def grid_sample_2d_packed(packed: jnp.ndarray, coords: jnp.ndarray, *,
                          align_corners: bool = False) -> jnp.ndarray:
    """Bilinear sample from a corner-packed map (see `pack_corners`) with
    border padding semantics — exactly grid_sample_2d(..., "border",
    "bilinear") but one row gather per point.

    packed: (..., H, W, 4C); coords: (..., P, 2) -> (..., P, C).
    """
    h, w = packed.shape[-3], packed.shape[-2]
    c4 = packed.shape[-1]
    c = c4 // 4
    x = _unnormalize(coords[..., 0], w, align_corners)
    y = _unnormalize(coords[..., 1], h, align_corners)
    x = jnp.clip(x, 0.0, w - 1)
    y = jnp.clip(y, 0.0, h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = (x - x0)[..., None]
    wy1 = (y - y0)[..., None]
    rows = _row_gather(packed, y0.astype(jnp.int32), x0.astype(jnp.int32))
    v00 = rows[..., :c]
    v01 = rows[..., c:2 * c]
    v10 = rows[..., 2 * c:3 * c]
    v11 = rows[..., 3 * c:]
    top = v00 * (1 - wx1) + v01 * wx1
    bot = v10 * (1 - wx1) + v11 * wx1
    return top * (1 - wy1) + bot * wy1


def grid_sample_2d_tiles(image: jnp.ndarray, coords: jnp.ndarray,
                         region_hw, *, precision=None) -> jnp.ndarray:
    """Bilinear sample for TILE-GROUPED points via per-tile dense regions —
    gather-free (measured 6x the x-pair row gathers at 8x48 regions,
    scripts/bench_strip_fetch.py).

    Each tile's points must project into a compact quad (epipolar
    geometry: a patch of rays x its samples). Per tile: dynamic_slice a
    static (rh, rw) region at the tile's coordinate minimum, then
    interpolate with separable hat-function matmuls
    (val[p] = sum_y hy[p,y] * sum_x hx[p,x] * R[y,x,:]) — dense MXU work.
    The backward is matmuls + dynamic_update_slice-add (no scatter), so
    the formulation trains.

    Semantics match grid_sample_2d(..., align_corners=False, "border")
    EXACTLY for points whose (clipped) coords fall inside their tile's
    region; points outside get ZERO features (all hat weights vanish).
    Callers must size region_hw from the geometry (tile extent +
    disparity span) — `tile_region_fit` reports the fit mask.

    image: (H, W, C); coords: (T, P, 2) normalized per-tile points.
    Returns (T, P, C) in image's dtype.
    """
    h, w, c = image.shape
    rh, rw = region_hw
    px = jnp.clip(_unnormalize(coords[..., 0], w, False), 0.0, w - 1)
    py = jnp.clip(_unnormalize(coords[..., 1], h, False), 0.0, h - 1)
    x0 = jnp.clip(jnp.min(px, axis=1).astype(jnp.int32), 0, max(w - rw, 0))
    y0 = jnp.clip(jnp.min(py, axis=1).astype(jnp.int32), 0, max(h - rh, 0))

    ry = jnp.arange(rh, dtype=px.dtype)
    rx = jnp.arange(rw, dtype=px.dtype)
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(
        (py - y0[:, None].astype(py.dtype))[..., None] - ry))   # (T, P, rh)
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(
        (px - x0[:, None].astype(px.dtype))[..., None] - rx))   # (T, P, rw)

    def one(y0_, x0_, hy_, hx_):
        region = jax.lax.dynamic_slice(image, (y0_, x0_, 0), (rh, rw, c))
        inner = jnp.einsum("pr,yrc->pyc", hx_.astype(image.dtype), region,
                           precision=precision)
        return jnp.einsum("py,pyc->pc", hy_.astype(image.dtype), inner,
                          precision=precision)

    return jax.vmap(one)(y0, x0, hy, hx)


def tile_region_fit(coords: jnp.ndarray, image_hw, region_hw):
    """Per-tile bool: does every (clipped) point of the tile fall inside a
    (rh, rw) region anchored at the tile minimum? coords: (T, P, 2)."""
    h, w = image_hw
    rh, rw = region_hw
    px = jnp.clip(_unnormalize(coords[..., 0], w, False), 0.0, w - 1)
    py = jnp.clip(_unnormalize(coords[..., 1], h, False), 0.0, h - 1)
    dx = jnp.max(px, axis=1) - jnp.min(px, axis=1)
    dy = jnp.max(py, axis=1) - jnp.min(py, axis=1)
    return (dy <= rh - 1) & (dx <= rw - 1)


def _lattice_matrix(out_size: int, in_size: int,
                    align_corners: bool = False) -> "np.ndarray":
    """(out_size, in_size) bilinear-resample matrix for the uniform
    linspace(-1, 1, out_size) lattice under border padding — the 1-D
    factor of what grid_sample_2d computes on that lattice.

    align_corners=False (default): input texel centers follow the
    grid_sample convention (texel i at NDC (2i+1)/in - 1). True: input
    values live AT linspace(-1, 1, in_size) inclusive — the convention for
    values computed on an NDC pixel lattice (geometry.unproj_map), used by
    the sweep renderer to interpolate warp-lattice values to render
    resolution."""
    import numpy as np
    x = np.linspace(-1.0, 1.0, out_size, dtype=np.float64)
    u = _unnormalize(x, in_size, align_corners)
    u = np.clip(u, 0.0, in_size - 1)               # border
    i0 = np.floor(u).astype(np.int64)
    f = (u - i0).astype(np.float64)
    i1 = np.minimum(i0 + 1, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    mat[np.arange(out_size), i0] += (1.0 - f).astype(np.float32)
    mat[np.arange(out_size), i1] += f.astype(np.float32)
    return mat


def resample_uniform_lattice(image: jnp.ndarray, out_hw,
                             align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resample of `image` onto the uniform linspace(-1, 1)
    lattice — numerically the separable form of
    grid_sample_2d(image, lattice, align_corners, "border").

    The lattice is static, so the resample factors into two small banded
    matmuls (rows then columns) that run on the MXU instead of 4 gather
    streams: 1.21 -> ~0.07 ms for a (192, 640, 64) map resampled to its own
    resolution (PERF.md finding 12). The dense matrices waste FLOPs (only
    2 nonzeros per row) but MXU FLOPs are idle in this phase.

    image: (H, W, C); out_hw: (out_h, out_w). Returns (out_h, out_w, C)
    in image's dtype (f32 MXU accumulation — at least as accurate as the
    gather path's lerp).
    """
    h, w, _ = image.shape
    oh, ow = out_hw
    ry = jnp.asarray(_lattice_matrix(oh, h, align_corners),
                     dtype=image.dtype)
    rx = jnp.asarray(_lattice_matrix(ow, w, align_corners),
                     dtype=image.dtype)
    out = jnp.einsum("oh,hwc->owc", ry, image)
    out = jnp.einsum("pw,owc->opc", rx, out)
    return out.astype(image.dtype)
