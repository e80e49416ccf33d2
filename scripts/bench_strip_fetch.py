"""Tile-region dense fetch vs per-sample row gathers (VERDICT r4 ask #1,
the reference-semantics/jittered side).

The sweep path (models/sweep.py) removes per-sample gathers for SERVING by
sharing the z-ladder across rays. Training keeps per-ray stratified jitter,
where the remaining dense-fetch candidate is the TILE formulation: a tile
of T rays x K samples projects into a compact quad of the feature map, so
fetch a static-size region per tile with dynamic_slice and interpolate
in-region with SEPARABLE hat-function matmuls (the bilinear weight factors
per axis: val[p] = sum_ry hy[p,ry] * (sum_rx hx[p,rx] * R[ry,rx,:])) —
dense MXU work instead of random access.

This measures that candidate honestly against the incumbent x-pair row
gathers (PERF.md finding 3b) at realistic epipolar geometry (stereo-offset
camera, lindisp jittered samples), plus a parity check that the region
formulation reproduces grid_sample where the region covers the tile.

Measured verdict (round 5 on chip): the candidate WINS — 245k points in
0.312 ms at an 8x48 region (100% tile coverage on this geometry) vs
1.876 ms for the incumbent x-pair gathers (6x); 16x64 still 3.4x. The
separable form (hat matmuls ride the idle MXU) beats per-row random
access exactly like PERF.md finding 12's lattice resample. See the PERF
kernel decision index for the integration status/considerations (static
region sizing needs a per-config bound + fit fallback; the backward is
matmuls + dynamic_update_slice-add instead of scatter-add).

Usage: python scripts/bench_strip_fetch.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from behindthescenes_tpu.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from behindthescenes_tpu.ops.grid_sample import (grid_sample_2d,
                                                 grid_sample_2d_xpair,
                                                 pack_corners_x)

FH, FW, C = 96, 320, 64
K = 64
ITERS = (4, 24)


def timeit(name, fn, *args):
    def looped(n, *a):
        def body(i, acc):
            return acc + fn(*a, salt=acc * 1e-12)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jf = jax.jit(looped)
    lo, hi = jnp.int32(ITERS[0]), jnp.int32(ITERS[1])
    float(jf(lo, *args))
    float(jf(hi, *args))

    def t(n):
        t0 = time.perf_counter()
        float(jf(n, *args))
        return time.perf_counter() - t0

    ts = [(t(lo), t(hi)) for _ in range(4)]
    ms = (np.median([b for _, b in ts]) - np.median([a for a, _ in ts])) \
        / (ITERS[1] - ITERS[0]) * 1e3
    print(f"{name:52s} {ms:8.3f} ms", flush=True)
    return ms


def make_geometry(n_rays=3840, seed=0):
    """Per-sample fetch coords for tiles of rays under realistic epipolar
    geometry: 8x8 pixel tiles of a 192x640 novel view 0.54 m beside the
    source camera, K lindisp-jittered samples each, projected to source
    NDC. Returns xy (n_tiles, T*K, 2) grouped by tile."""
    rng = np.random.default_rng(seed)
    tile = 8
    n_tiles = n_rays // (tile * tile)
    fx, fy = 0.6, 1.8
    xs, ys = [], []
    for _ in range(n_tiles):
        ty = rng.integers(0, 192 - tile)
        tx = rng.integers(0, 640 - tile)
        py, px = np.meshgrid(np.arange(ty, ty + tile),
                             np.arange(tx, tx + tile), indexing="ij")
        ndc_x = px.reshape(-1) / 639 * 2 - 1
        ndc_y = py.reshape(-1) / 191 * 2 - 1
        dirs = np.stack([ndc_x / fx, ndc_y / fy, np.ones(tile * tile)], -1)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        s = (np.arange(K) + rng.uniform(0, 1, (tile * tile, K))) / K
        z = 1.0 / (1 / 3.0 * (1 - s) + 1 / 80.0 * s)
        pts = dirs[:, None, :] * z[..., None]
        pts[..., 0] += 0.54                       # stereo baseline
        xy = np.stack([fx * pts[..., 0] / pts[..., 2],
                       fy * pts[..., 1] / pts[..., 2]], -1)
        xs.append(xy.reshape(-1, 2))
    return np.clip(np.stack(xs), -1, 1).astype(np.float32)


def region_stats(xy):
    """Per-tile source-pixel bbox sizes (drives the static region size)."""
    px = (xy[..., 0] + 1) * 0.5 * FW
    py = (xy[..., 1] + 1) * 0.5 * FH
    dx = px.max(1) - px.min(1)
    dy = py.max(1) - py.min(1)
    print(f"tile bbox: dx p50={np.percentile(dx, 50):.0f} "
          f"p99={np.percentile(dx, 99):.0f}  dy p50="
          f"{np.percentile(dy, 50):.0f} p99={np.percentile(dy, 99):.0f}")
    return dx, dy


def hat(u, idx):
    """(P, R) separable bilinear weights of coords u against region rows
    idx: max(0, 1 - |u - idx|)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[:, None] - idx[None, :]))


def main():
    rng = np.random.default_rng(1)
    fmap = jnp.asarray(rng.normal(size=(FH, FW, C)), jnp.bfloat16)
    packed = pack_corners_x(fmap)
    xy_t = make_geometry()
    n_tiles, tk, _ = xy_t.shape
    xy_flat = jnp.asarray(xy_t.reshape(1, -1, 2))
    dx, dy = region_stats(xy_t)
    print(f"workload: {n_tiles} tiles x {tk} pts = {n_tiles * tk} points")

    # Incumbent: x-pair row gathers (2 gathers/pt, PERF finding 3b).
    timeit("incumbent x-pair row gathers",
           lambda xy, salt=0.0: jnp.sum(grid_sample_2d_xpair(
               packed, xy + salt).astype(jnp.float32)) * 1e-9, xy_flat)

    # Candidate: per-tile static region dynamic_slice + separable matmuls.
    # Region sizes sized from the bbox stats above (a production version
    # needs a fallback for tiles exceeding the static region; report the
    # coverage each size achieves on this geometry).
    for rh, rw in ((8, 48), (16, 64), (32, 96)):
        cover = float(np.mean((dy < rh - 2) & (dx < rw - 2)) * 100)
        print(f"  region {rh}x{rw}: covers {cover:.1f}% of tiles")
        ry_idx = jnp.arange(rh, dtype=jnp.float32)
        rx_idx = jnp.arange(rw, dtype=jnp.float32)

        def tile_fetch(xy, salt=0.0, rh=rh, rw=rw, ry_idx=ry_idx,
                       rx_idx=rx_idx):
            def one(xy_tile):
                px = jnp.clip((xy_tile[:, 0] + 1) * 0.5 * FW - 0.5,
                              0, FW - 1)
                py = jnp.clip((xy_tile[:, 1] + 1) * 0.5 * FH - 0.5,
                              0, FH - 1)
                y0 = jnp.clip(jnp.min(py).astype(jnp.int32), 0, FH - rh)
                x0 = jnp.clip(jnp.min(px).astype(jnp.int32), 0, FW - rw)
                region = jax.lax.dynamic_slice(fmap, (y0, x0, 0),
                                               (rh, rw, C))
                hy = hat(py - y0, ry_idx)              # (P, rh)
                hx = hat(px - x0, rx_idx)              # (P, rw)
                inner = jnp.einsum("pr,yrc->pyc", hx.astype(jnp.bfloat16),
                                   region)             # (P, rh, C)
                return jnp.einsum("py,pyc->pc", hy.astype(jnp.bfloat16),
                                  inner)
            vals = jax.vmap(one)(xy + salt)
            return jnp.sum(vals.astype(jnp.float32)) * 1e-9

        timeit(f"tile region {rh}x{rw} separable matmuls", tile_fetch,
               jnp.asarray(xy_t))

    # Parity spot check (f32 region path vs grid_sample on tiles whose
    # bbox fits the region).
    fmap32 = fmap.astype(jnp.float32)
    xy0 = jnp.asarray(xy_t[:1])
    px = (xy0[0, :, 0] + 1) * 0.5 * FW - 0.5
    py = (xy0[0, :, 1] + 1) * 0.5 * FH - 0.5
    y0 = jnp.clip(jnp.min(py).astype(jnp.int32), 0, FH - 48)
    x0 = jnp.clip(jnp.min(px).astype(jnp.int32), 0, FW - 128)
    region = jax.lax.dynamic_slice(fmap32, (y0, x0, 0), (48, 128, C))
    hy = hat(jnp.clip(py, 0, FH - 1) - y0, jnp.arange(48, dtype=jnp.float32))
    hx = hat(jnp.clip(px, 0, FW - 1) - x0,
             jnp.arange(128, dtype=jnp.float32))
    vals = jnp.einsum("py,pyc->pc", hy,
                      jnp.einsum("pr,yrc->pyc", hx, region,
                                 precision="highest"),
                      precision="highest")
    want = grid_sample_2d(fmap32, xy0[0])
    fits = np.asarray((py.max() - py.min() < 46) & (px.max() - px.min() < 126))
    dev = float(jnp.abs(vals - want).max())
    print(f"parity (tile 0, fits={bool(fits)}): max dev {dev:.2e}")


if __name__ == "__main__":
    main()
