"""Model component tests: MLPs, encoders, and the BTSNet field."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from behindthescenes_tpu.models.encoder import (EncoderDummy, Monodepth2,
                                                make_backbone)
from behindthescenes_tpu.models.mlp import ResnetFC, ImplicitNet, make_mlp
from behindthescenes_tpu.models.bts import BTSNet


def test_resnetfc_shapes_and_zero_init_identity():
    mlp = ResnetFC(d_out=1, n_blocks=2, d_hidden=32)
    x = jnp.ones((4, 10, 17))
    params = mlp.init(jax.random.PRNGKey(0), x)
    out = mlp.apply(params, x)
    assert out.shape == (4, 10, 1)
    # Blocks' fc_1 is zero-init: removing blocks must not change the output
    # at initialization (residual starts as identity).
    mlp0 = ResnetFC(d_out=1, n_blocks=0, d_hidden=32)
    p0 = {"params": {"lin_in": params["params"]["lin_in"],
                     "lin_out": params["params"]["lin_out"]}}
    out0 = mlp0.apply(p0, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out0), atol=1e-6)


def test_implicitnet_shapes():
    mlp = ImplicitNet(d_out=4, dims=(32, 32), skip_in=(1,))
    x = jnp.ones((2, 5, 9))
    params = mlp.init(jax.random.PRNGKey(0), x)
    out = mlp.apply(params, x)
    assert out.shape == (2, 5, 4)


@pytest.mark.parametrize("layers", [18, 50])
def test_monodepth2_feature_pyramid(layers):
    enc = Monodepth2(resnet_layers=layers, d_out=16,
                     num_ch_dec=(16, 16, 32, 32, 64))
    x = jnp.zeros((1, 64, 96, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    assert len(feats) == 4
    # Scale 0 is full input resolution; each next scale halves.
    assert feats[0].shape == (1, 64, 96, 16)
    assert feats[1].shape == (1, 32, 48, 16)
    assert feats[2].shape == (1, 16, 24, 16)
    assert feats[3].shape == (1, 8, 12, 16)


def _tiny_bts(sample_color=True, learn_empty=False, empty_empty=False):
    return BTSNet(
        z_near=1.0, z_far=20.0,
        encoder_conf={"type": "dummy", "size": (16, 24), "d_out": 8},
        code_conf={"num_freqs": 4, "freq_factor": 1.5},
        mlp_coarse_conf={"type": "resnet", "n_blocks": 0, "d_hidden": 16},
        mlp_fine_conf={"type": "empty"},
        learn_empty=learn_empty, empty_empty=empty_empty,
        sample_color=sample_color,
    )


def _bts_inputs(n=2, v=3, h=16, w=24):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (n, v, h, w, 3)),
                         dtype=jnp.float32)
    poses = jnp.broadcast_to(jnp.eye(4), (n, v, 4, 4))
    # Spread cameras along x.
    offsets = jnp.arange(v, dtype=jnp.float32) * 0.2
    poses = poses.at[:, :, 0, 3].set(offsets[None])
    ks = jnp.broadcast_to(
        jnp.asarray([[1.2, 0, 0], [0, 1.1, 0], [0, 0, 1.0]]), (n, v, 3, 3))
    return images, ks, poses


def test_btsnet_encode_query_shapes():
    net = _tiny_bts()
    images, ks, poses = _bts_inputs()
    xyz = jnp.asarray(np.random.default_rng(1).uniform(
        -0.5, 0.5, (2, 50, 3)) + np.array([0, 0, 5.0]), dtype=jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), images, ks, poses, xyz)

    grid = net.apply(variables, images, ks, poses, ids_encoder=[0],
                     ids_render=[1, 2], method=BTSNet.encode)
    assert grid.features[0].shape == (2, 1, 16, 24, 8)
    assert grid.color_imgs.shape == (2, 2, 16, 24, 3)

    rgb, invalid, sigma = net.apply(variables, grid, xyz,
                                    method=BTSNet.query)
    assert rgb.shape == (2, 50, 2 * 3)       # 2 render views * rgb
    assert invalid.shape == (2, 50, 2)
    assert sigma.shape == (2, 50, 1)
    assert np.all(np.asarray(sigma) >= 0)    # softplus

    # only_density path
    rgb_d, invalid_d, sigma_d = net.apply(
        variables, grid, xyz, only_density=True, method=BTSNet.query)
    assert np.all(np.asarray(rgb_d) == 0)
    np.testing.assert_allclose(np.asarray(sigma_d), np.asarray(sigma),
                               atol=1e-6)


def test_btsnet_points_behind_camera_invalid():
    net = _tiny_bts(empty_empty=True)
    images, ks, poses = _bts_inputs()
    xyz_behind = jnp.full((2, 10, 3), -5.0)
    variables = net.init(jax.random.PRNGKey(0), images, ks, poses, xyz_behind)
    grid = net.apply(variables, images, ks, poses, method=BTSNet.encode)
    rgb, invalid, sigma = net.apply(variables, grid, xyz_behind,
                                    method=BTSNet.query)
    assert np.all(np.asarray(invalid) == 1.0)
    # empty_empty zeroes sigma for invalid features.
    np.testing.assert_allclose(np.asarray(sigma), 0.0, atol=1e-7)


def test_btsnet_learn_empty_feature_used():
    net = _tiny_bts(learn_empty=True)
    images, ks, poses = _bts_inputs()
    xyz = jnp.full((2, 4, 3), -5.0)  # all behind camera -> empty feature
    variables = net.init(jax.random.PRNGKey(0), images, ks, poses, xyz)
    grid = net.apply(variables, images, ks, poses, method=BTSNet.encode)
    feats, invalid = net.apply(variables, grid, xyz,
                               method=BTSNet.sample_features)
    assert bool(np.all(np.asarray(invalid)))
    # Sampled latent equals the learned empty feature everywhere.
    empty = np.asarray(variables["params"]["empty_feature"])
    got = np.asarray(feats)[..., :8]
    np.testing.assert_allclose(got, np.broadcast_to(empty, got.shape),
                               atol=1e-6)


def test_btsnet_no_sample_color_rgb_from_mlp():
    net = _tiny_bts(sample_color=False)
    images, ks, poses = _bts_inputs()
    xyz = jnp.asarray(np.random.default_rng(2).uniform(
        -0.3, 0.3, (1, 20, 3)) + np.array([0, 0, 3.0]), dtype=jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), images[:1], ks[:1], poses[:1],
                         xyz)
    grid = net.apply(variables, images[:1], ks[:1], poses[:1],
                     method=BTSNet.encode)
    rgb, invalid, sigma = net.apply(variables, grid, xyz,
                                    method=BTSNet.query)
    assert rgb.shape == (1, 20, 3)
    assert np.all((np.asarray(rgb) >= 0) & (np.asarray(rgb) <= 1))


def test_make_backbone_dummy():
    enc = make_backbone({"type": "dummy", "size": (8, 12), "d_out": 4})
    assert isinstance(enc, EncoderDummy)
    x = jnp.zeros((3, 8, 12, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    assert feats[0].shape == (3, 8, 12, 4)
