"""Packed-corner bilinear sampling parity with grid_sample_2d."""
import jax.numpy as jnp
import numpy as np

from behindthescenes_tpu.ops.grid_sample import (grid_sample_2d,
                                                 grid_sample_2d_packed,
                                                 pack_corners)


def test_packed_matches_plain_bilinear_border():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 9, 13, 3)),
                      dtype=jnp.float32)
    coords = jnp.asarray(rng.uniform(-1.4, 1.4, (2, 200, 2)),
                         dtype=jnp.float32)
    expected = np.asarray(grid_sample_2d(img, coords,
                                         padding_mode="border"))
    got = np.asarray(grid_sample_2d_packed(pack_corners(img), coords))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_pack_corners_edges():
    img = jnp.arange(12.0).reshape(1, 3, 4, 1)
    packed = pack_corners(img)
    assert packed.shape == (1, 3, 4, 4)
    p = np.asarray(packed)
    # Interior pixel (1,1): corners are (1,1),(1,2),(2,1),(2,2)
    np.testing.assert_allclose(p[0, 1, 1], [5, 6, 9, 10])
    # Bottom-right corner clamps.
    np.testing.assert_allclose(p[0, 2, 3], [11, 11, 11, 11])
