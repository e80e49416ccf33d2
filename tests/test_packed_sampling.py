"""Packed-corner bilinear sampling parity with grid_sample_2d."""
import jax.numpy as jnp
import numpy as np

from behindthescenes_tpu.ops.grid_sample import (grid_sample_2d,
                                                 grid_sample_2d_packed,
                                                 grid_sample_2d_xpair,
                                                 pack_corners,
                                                 pack_corners_x)


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


def test_xpair_matches_plain_bilinear_border():
    """f32 x-pair path is exact vs the generic sampler (border padding)."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((2, 9, 13, 64)),
                      dtype=jnp.float32)
    coords = jnp.asarray(rng.uniform(-1.4, 1.4, (2, 200, 2)),
                         dtype=jnp.float32)
    expected = np.asarray(grid_sample_2d(img, coords,
                                         padding_mode="border"))
    got = np.asarray(grid_sample_2d_xpair(pack_corners_x(img), coords))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_xpair_bf16_close_to_f32():
    """bf16 x-pair interp (bf16 lerp weights) stays within bf16 storage
    noise of the exact f32 result."""
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((1, 9, 13, 64)),
                      dtype=jnp.float32)
    coords = jnp.asarray(rng.uniform(-1.2, 1.2, (1, 300, 2)),
                         dtype=jnp.float32)
    expected = np.asarray(grid_sample_2d(img, coords,
                                         padding_mode="border"))
    got = np.asarray(grid_sample_2d_xpair(
        pack_corners_x(img.astype(jnp.bfloat16)), coords)).astype(np.float32)
    # bf16 relative step is 2^-8; corners + two lerps stay within a few ulps
    np.testing.assert_allclose(got, expected, atol=0.05)
    assert np.median(np.abs(got - expected)) < 0.01


def test_encode_pack_choice_by_width():
    """Wide feature maps (C > 32) must use the x-pair pack (2C-element
    gather rows): 4-corner rows would exceed the 128-element TPU row-gather
    limit and fall off a 6x cliff (PERF.md finding 3b)."""
    import jax
    from behindthescenes_tpu.models.bts import BTSNet

    def grid_for(d_out):
        net = BTSNet.from_conf({
            "z_near": 1.0, "z_far": 40.0, "inv_z": True,
            "learn_empty": False,
            "code": {"num_freqs": 4, "freq_factor": 1.5},
            "encoder": {"type": "dummy", "size": (8, 12), "d_out": d_out},
            "mlp_coarse": {"type": "resnet", "n_blocks": 0, "d_hidden": 32},
            "mlp_fine": {"type": "empty"},
        }, compute_dtype=jnp.bfloat16)
        imgs = jnp.zeros((1, 1, 8, 12, 3))
        poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
        projs = jnp.broadcast_to(jnp.eye(3), (1, 1, 3, 3))
        v = net.init(jax.random.PRNGKey(0), imgs, projs, poses,
                     jnp.zeros((1, 4, 3)))
        return net.apply(v, imgs, projs, poses, method=BTSNet.encode)

    assert grid_for(64).features_packed[0].shape[-1] == 2 * 64   # x-pair
    assert grid_for(16).features_packed[0].shape[-1] == 4 * 16   # 4-corner


def test_pack_corners_edges():
    img = jnp.arange(12.0).reshape(1, 3, 4, 1)
    packed = pack_corners(img)
    assert packed.shape == (1, 3, 4, 4)
    p = np.asarray(packed)
    # Interior pixel (1,1): corners are (1,1),(1,2),(2,1),(2,2)
    np.testing.assert_allclose(p[0, 1, 1], [5, 6, 9, 10])
    # Bottom-right corner clamps.
    np.testing.assert_allclose(p[0, 2, 3], [11, 11, 11, 11])
