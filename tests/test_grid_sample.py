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
