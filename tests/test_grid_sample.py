"""Bit-level parity of grid_sample_2d with torch.nn.functional.grid_sample.

The reference's hot path depends on exact grid_sample semantics
(align_corners=False, padding_mode=border, models_bts.py:179,234); drift here
shifts abs_rel. We test against torch CPU as the golden oracle.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from behindthescenes_tpu.ops import grid_sample_2d


def _torch_ref(img_nchw, coords, align_corners, padding_mode, mode):
    t_img = torch.from_numpy(img_nchw)
    t_grid = torch.from_numpy(coords[:, None])  # (N, 1, P, 2)
    out = F.grid_sample(t_img, t_grid, mode=mode, padding_mode=padding_mode,
                        align_corners=align_corners)
    return out[:, :, 0].permute(0, 2, 1).numpy()  # (N, P, C)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_parity(align_corners, padding_mode, mode):
    rng = np.random.default_rng(42)
    n, h, w, c = 2, 7, 11, 5
    img = rng.standard_normal((n, c, h, w)).astype(np.float32)
    # Coords spanning inside, outside, and exactly on the border.
    coords = rng.uniform(-1.5, 1.5, (n, 64, 2)).astype(np.float32)
    coords[:, :4] = np.array([[-1, -1], [1, 1], [0, 0], [1, -1]],
                             dtype=np.float32)

    expected = _torch_ref(img, coords, align_corners, padding_mode, mode)
    img_nhwc = np.transpose(img, (0, 2, 3, 1))
    got = np.asarray(grid_sample_2d(
        jnp.asarray(img_nhwc), jnp.asarray(coords),
        align_corners=align_corners, padding_mode=padding_mode, mode=mode))
    np.testing.assert_allclose(got, expected, atol=2e-6)


def test_grid_sample_batch_dims():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 3, 4, 6, 2)).astype(np.float32)  # (B,V,H,W,C)
    coords = rng.uniform(-1, 1, (2, 3, 10, 2)).astype(np.float32)
    out = grid_sample_2d(jnp.asarray(img), jnp.asarray(coords))
    assert out.shape == (2, 3, 10, 2)
    flat = np.asarray(grid_sample_2d(
        jnp.asarray(img.reshape(6, 4, 6, 2)),
        jnp.asarray(coords.reshape(6, 10, 2))))
    np.testing.assert_allclose(np.asarray(out).reshape(6, 10, 2), flat,
                               atol=1e-6)


def test_grid_sample_gradable():
    import jax
    img = jnp.ones((1, 4, 4, 1))
    coords = jnp.zeros((1, 3, 2))

    def f(im):
        return grid_sample_2d(im, coords).sum()

    g = jax.grad(f)(img)
    assert np.isfinite(np.asarray(g)).all()


def test_resample_uniform_lattice_matches_grid_sample():
    """The separable MXU resample must equal grid_sample_2d on the uniform
    linspace(-1,1) lattice (align_corners=False, border) — the self-view
    fast paths' sampling pattern."""
    from behindthescenes_tpu.ops.grid_sample import (
        grid_sample_2d, resample_uniform_lattice)
    rng = np.random.default_rng(0)
    for (h, w), (oh, ow) in (((12, 20), (12, 20)), ((12, 20), (24, 40)),
                             ((9, 7), (5, 11))):
        img = jnp.asarray(rng.normal(size=(h, w, 6)), dtype=jnp.float32)
        xs = jnp.linspace(-1.0, 1.0, ow)
        ys = jnp.linspace(-1.0, 1.0, oh)
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
        xy = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)
        ref = grid_sample_2d(img[None], xy[None], align_corners=False,
                             padding_mode="border")[0]
        got = resample_uniform_lattice(img, (oh, ow)).reshape(oh * ow, 6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)


def test_tile_region_fetch_matches_grid_sample():
    """grid_sample_2d_tiles must equal grid_sample_2d exactly (f32 pinned)
    for tiles whose points fit their region — including border-clamped
    points when the region touches the image edge."""
    import jax
    from behindthescenes_tpu.ops.grid_sample import (grid_sample_2d,
                                                     grid_sample_2d_tiles,
                                                     tile_region_fit)
    rng = np.random.default_rng(3)
    h, w, c = 24, 64, 8
    img = jnp.asarray(rng.normal(size=(h, w, c)), dtype=jnp.float32)
    # Tiles: compact clusters, one hugging the border (clamp case).
    centers = np.array([[-0.6, -0.2], [0.3, 0.5], [0.98, 0.9]])
    pts = centers[:, None, :] + rng.uniform(-0.12, 0.12, (3, 40, 2))
    pts = jnp.asarray(np.clip(pts, -1.2, 1.2), dtype=jnp.float32)

    region = (10, 14)
    fit = np.asarray(tile_region_fit(pts, (h, w), region))
    assert fit.all(), fit
    got = grid_sample_2d_tiles(img, pts, region, precision="highest")
    ref = grid_sample_2d(jnp.broadcast_to(img, (3, h, w, c)), pts,
                         align_corners=False, padding_mode="border")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # Gradients flow (dynamic_update_slice-add + matmuls, no scatter).
    def f(im):
        return jnp.sum(grid_sample_2d_tiles(im, pts, region,
                                            precision="highest") ** 2)

    g = jax.grad(f)(img)
    assert np.isfinite(np.asarray(g)).all()

    def fr(im):
        return jnp.sum(grid_sample_2d(
            jnp.broadcast_to(im, (3, h, w, c)), pts,
            align_corners=False, padding_mode="border") ** 2)

    gr = jax.grad(fr)(img)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-4)
