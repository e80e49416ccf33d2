"""Parity for the layer-zoo extras (ops/layers_extra.py) against the ACTUAL
reference layer library (models/common/model/layers.py), with transferred
weights. Closes VERDICT round-1 missing #6 (Backprojection / warp / PadSame
family)."""
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests import reference_oracle

from behindthescenes_tpu.ops import layers_extra as lx


@pytest.fixture(scope="module")
def ref_layers():
    reference_oracle.install_stubs()
    if reference_oracle.REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, reference_oracle.REFERENCE_ROOT)
    import models.common.model.layers as ref_layers_mod
    return ref_layers_mod


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def _conv_w(tmod):
    """torch Conv2d (out,in,kh,kw) -> flax (kh,kw,in,out)."""
    return {"kernel": jnp.asarray(
        tmod.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(tmod.bias.detach().numpy())}


def _convT_w(tmod):
    """torch ConvTranspose2d (in,out,kh,kw) -> flax ConvTranspose
    (kh,kw,in,out), spatially flipped (verified exact on integers)."""
    k = tmod.weight.detach().numpy().transpose(2, 3, 0, 1)[::-1, ::-1]
    return {"kernel": jnp.asarray(k.copy()),
            "bias": jnp.asarray(tmod.bias.detach().numpy())}


def test_backprojection_parity(ref_layers):
    rng = np.random.default_rng(0)
    n, h, w = 2, 5, 9
    depth = rng.uniform(1.0, 10.0, (n, h, w)).astype(np.float32)
    k = np.broadcast_to(np.array(
        [[0.7, 0, 0.05], [0, 1.3, -0.1], [0, 0, 1]], dtype=np.float32),
        (n, 3, 3)).copy()
    inv_k = np.linalg.inv(k)

    bp = ref_layers.Backprojection(h, w)
    ref = bp(_t(depth), _t(inv_k)).detach().numpy()       # (n, 4, h*w)
    ours = np.asarray(lx.backproject(jnp.asarray(depth), jnp.asarray(inv_k)))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=1e-5)


def test_point_projection_parity(ref_layers):
    rng = np.random.default_rng(1)
    n, h, w = 2, 4, 6
    pts = rng.normal(size=(n, 4, h * w)).astype(np.float32)
    pts[:, 2] += 5.0
    pts[:, 3] = 1.0
    k = np.broadcast_to(np.array(
        [[0.7, 0, 0.0], [0, 1.3, 0], [0, 0, 1]], dtype=np.float32),
        (n, 3, 3)).copy()
    t = np.broadcast_to(np.eye(4, dtype=np.float32), (n, 4, 4)).copy()
    t[:, 0, 3] = 0.3
    t[:, 1, 3] = -0.2

    ref_xy, ref_z = ref_layers.point_projection(_t(pts), n, h, w, _t(k),
                                                _t(t))
    xy, z = lx.point_projection(jnp.asarray(pts.transpose(0, 2, 1)),
                                jnp.asarray(k), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(xy).reshape(n, h, w, 2),
                               ref_xy.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(z), ref_z.detach().numpy(),
                               atol=1e-5)


@pytest.mark.parametrize("k,s,hw", [(3, 1, (7, 9)), (4, 2, (7, 9)),
                                    (2, 1, (6, 8)), (1, 2, (5, 7)),
                                    (3, 2, (8, 10))])
def test_pad_same_parity(ref_layers, k, s, hw):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, *hw)).astype(np.float32)
    ref = ref_layers.PadSameConv2d(k, s)(_t(x)).detach().numpy()
    ours = np.asarray(lx.pad_same(
        jnp.asarray(x.transpose(0, 2, 3, 1)), k, s)).transpose(0, 3, 1, 2)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("k,s", [(3, 1), (3, 2), (4, 2)])
def test_conv_relu_parity(ref_layers, k, s):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 4, 9, 11)).astype(np.float32)
    ref_mod = ref_layers.ConvReLU(4, 6, k, stride=s)
    ref = ref_mod(_t(x)).detach().numpy()
    ours_mod = lx.ConvReLU(6, k, s)
    out = ours_mod.apply({"params": {"conv": _conv_w(ref_mod.conv)}},
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-5)


@pytest.mark.parametrize("k,s", [(3, 1), (3, 2)])
def test_conv_relu2_parity(ref_layers, k, s):
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 4, 9, 11)).astype(np.float32)
    ref_mod = ref_layers.ConvReLU2(4, 6, k, stride=s)
    ref = ref_mod(_t(x)).detach().numpy()
    out = lx.ConvReLU2(6, k, s).apply(
        {"params": {"conv_y": _conv_w(ref_mod.conv_y),
                    "conv_x": _conv_w(ref_mod.conv_x)}},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-5)


def test_upconv_parity(ref_layers):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 4, 5, 7)).astype(np.float32)
    ref_mod = ref_layers.Upconv(4, 6)
    ref = ref_mod(_t(x)).detach().numpy()
    out = lx.Upconv(6).apply({"params": {"conv": _conv_w(ref_mod.conv)}},
                             jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-5)


def test_conv_sig_parity(ref_layers):
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 4, 6, 9)).astype(np.float32)
    ref_mod = ref_layers.ConvSig(4, 2, 3, stride=1)
    ref = ref_mod(_t(x)).detach().numpy()
    out = lx.ConvSig(2, 3, 1).apply(
        {"params": {"conv": _conv_w(ref_mod.conv)}},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-5)


@pytest.mark.parametrize("hw", [(5, 7), (6, 8)])
def test_refine_parity(ref_layers, hw):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 4, *hw)).astype(np.float32)
    skip = rng.normal(size=(1, 2, hw[0] * 2, hw[1] * 2)).astype(np.float32)
    ref_mod = ref_layers.Refine(4, 6)
    ref = ref_mod(_t(x), _t(skip)).detach().numpy()
    out = lx.Refine(6).apply(
        {"params": {"conv2d_t": _convT_w(ref_mod.conv2d_t)}},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(skip.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-5)


def test_residual_image_identity_warp():
    """Warping the keyframe into itself must give ~zero residual; a frame
    that sees nothing must give exactly zero (mask path)."""
    rng = np.random.default_rng(8)
    n, h, w = 1, 16, 20
    key = jnp.asarray(rng.uniform(-0.8, 0.8, (n, h, w, 3)),
                      dtype=jnp.float32)
    pose = jnp.broadcast_to(jnp.eye(4), (n, 4, 4))
    k = jnp.broadcast_to(jnp.asarray(
        [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], dtype=jnp.float32),
        (n, 3, 3))
    inv_depth = jnp.full((n, h, w, 1), 0.5)

    res = lx.residual_image(key, pose, k, inv_depth, [key], [pose], [k],
                            inv_depth_min=0.2, inv_depth_max=0.05)
    assert np.asarray(res).shape == (n, h, w, 1)
    assert float(jnp.max(jnp.abs(res))) < 1e-3

    # A source camera translated far away sees nothing -> all masked -> 0.
    far = pose.at[:, 0, 3].set(1e6)
    res2 = lx.residual_image(key, pose, k, inv_depth, [key], [far], [k],
                             inv_depth_min=0.2, inv_depth_max=0.05)
    np.testing.assert_array_equal(np.asarray(res2), 0.0)

    # A genuinely different frame yields a positive residual somewhere.
    other = jnp.asarray(rng.uniform(-0.8, 0.8, (n, h, w, 3)),
                        dtype=jnp.float32)
    res3 = lx.residual_image(key, pose, k, inv_depth, [other], [pose], [k],
                             inv_depth_min=0.2, inv_depth_max=0.05)
    assert float(jnp.max(res3)) > 1e-3
