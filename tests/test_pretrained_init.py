"""Pretrained-encoder init + freeze wiring
(reference monodepth2.py:87-92 `pretrained`, :255-277 `cp_location`/`freeze`).

Builds a random torchvision-format resnet .pth via the oracle stub, loads it
through `apply_pretrained_encoder`, and checks functional equality against
the torch stem; also checks `freeze` kills backbone gradients and that
`make_backbone` rejects unknown config keys loudly.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_oracle import install_stubs

from behindthescenes_tpu.import_torch import (apply_pretrained_encoder,
                                              load_encoder_checkpoint)
from behindthescenes_tpu.models.encoder import (Monodepth2, ResnetEncoder,
                                                make_backbone)


@pytest.fixture(scope="module")
def tv_resnet18_ckpt(tmp_path_factory):
    install_stubs()
    import torchvision
    torch.manual_seed(1)
    model = torchvision.models.resnet18()
    # Nudge BN running stats off defaults so stats transfer is exercised.
    model.train()
    with torch.no_grad():
        model(torch.randn(2, 3, 64, 64))
    model.eval()
    path = tmp_path_factory.mktemp("tv") / "resnet18-f37072fd.pth"
    torch.save(model.state_dict(), str(path))
    return str(path), model


def test_load_torchvision_resnet_functional_parity(tv_resnet18_ckpt):
    """The loaded stem matches the torch stem functionally (not just shapes):
    run the 5-level pyramid both ways on the same input."""
    path, tmodel = tv_resnet18_ckpt
    sub_p, sub_s = load_encoder_checkpoint(path, resnet_layers=18)

    enc = ResnetEncoder(num_layers=18)
    x = np.random.default_rng(0).uniform(0, 1, (1, 64, 96, 3)) \
        .astype(np.float32)
    variables = {"params": sub_p["encoder"],
                 "batch_stats": sub_s["encoder"]}
    feats = enc.apply(variables, jnp.asarray(x))

    # Torch-side pyramid, replicating ResnetEncoder.forward
    # (reference monodepth2.py:96-107) on the raw torchvision model.
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    xt = (xt - 0.45) / 0.225
    with torch.no_grad():
        f = [tmodel.relu(tmodel.bn1(tmodel.conv1(xt)))]
        f.append(tmodel.layer1(tmodel.maxpool(f[-1])))
        f.append(tmodel.layer2(f[-1]))
        f.append(tmodel.layer3(f[-1]))
        f.append(tmodel.layer4(f[-1]))
    for s in range(5):
        theirs = np.transpose(f[s].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(feats[s]), theirs, atol=2e-3,
                                   err_msg=f"pyramid level {s}")


def test_apply_pretrained_encoder_via_cp_location(tv_resnet18_ckpt):
    """cp_location path: initialized BTS-style variables get the torchvision
    weights merged in; untouched subtrees (decoder) keep their init."""
    path, _ = tv_resnet18_ckpt
    enc_conf = {"type": "monodepth2", "resnet_layers": 18, "d_out": 16,
                "num_ch_dec": (16, 16, 32, 32, 64), "cp_location": path}
    net = make_backbone(dict(enc_conf))
    x = jnp.zeros((1, 64, 96, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    variables = {"params": {"encoder": variables["params"]},
                 "batch_stats": {"encoder": variables["batch_stats"]}}

    before = np.asarray(
        variables["params"]["encoder"]["encoder"]["conv1"]["kernel"])
    out = apply_pretrained_encoder(variables, enc_conf)
    after = np.asarray(out["params"]["encoder"]["encoder"]["conv1"]["kernel"])
    assert not np.allclose(before, after), "weights were not replaced"

    sub_p, _ = load_encoder_checkpoint(path, resnet_layers=18)
    np.testing.assert_array_equal(after, sub_p["encoder"]["conv1"]["kernel"])
    # Decoder untouched
    np.testing.assert_array_equal(
        np.asarray(out["params"]["encoder"]["decoder"]
                   ["upconv_0_0"]["conv"]["kernel"]),
        np.asarray(variables["params"]["encoder"]["decoder"]
                   ["upconv_0_0"]["conv"]["kernel"]))


def test_pretrained_missing_artifact_warns_not_crashes(caplog):
    """pretrained: true with no checkpoint available -> loud warning, random
    init (no egress in-env); pretrained_strict: true -> raises."""
    import logging
    enc_conf = {"type": "monodepth2", "resnet_layers": 18, "d_out": 16,
                "pretrained": True}
    net = make_backbone(dict(enc_conf))
    x = jnp.zeros((1, 64, 96, 3))
    v = net.init(jax.random.PRNGKey(0), x)
    variables = {"params": {"encoder": v["params"]},
                 "batch_stats": {"encoder": v["batch_stats"]}}
    with caplog.at_level(logging.WARNING):
        out = apply_pretrained_encoder(variables, enc_conf)
    assert any("RANDOM encoder weights" in r.message for r in caplog.records)
    assert out["params"] is variables["params"] or \
        jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: np.array_equal(a, b),
            out["params"], variables["params"]))

    with pytest.raises(FileNotFoundError):
        apply_pretrained_encoder(
            variables, dict(enc_conf, pretrained_strict=True))


def test_freeze_stops_backbone_gradients():
    """freeze: true -> zero gradients through the whole backbone
    (reference monodepth2.py:275-277)."""
    x = jnp.asarray(np.random.default_rng(2).uniform(
        -1, 1, (1, 64, 96, 3)).astype(np.float32))

    def grads_for(freeze):
        net = Monodepth2(resnet_layers=18, d_out=16,
                         num_ch_dec=(16, 16, 32, 32, 64), freeze=freeze)
        variables = net.init(jax.random.PRNGKey(0), x)

        def loss(params):
            out = net.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x)
            return sum(jnp.sum(o ** 2) for o in out)

        return jax.grad(loss)(variables["params"])

    g_frozen = grads_for(True)
    assert all(float(jnp.abs(g).max()) == 0.0
               for g in jax.tree_util.tree_leaves(g_frozen))
    g_live = grads_for(False)
    assert any(float(jnp.abs(g).max()) > 0.0
               for g in jax.tree_util.tree_leaves(g_live))


def test_make_backbone_rejects_unknown_keys():
    with pytest.raises(ValueError, match="unknown encoder config keys"):
        make_backbone({"type": "monodepth2", "resnet_layer": 18})
    with pytest.raises(ValueError, match="unknown encoder config keys"):
        make_backbone({"type": "spatial", "freeze": True})
    # The flagship config's key set passes.
    make_backbone({"type": "monodepth2", "freeze": False, "pretrained": True,
                   "resnet_layers": 50, "num_ch_dec": [32, 32, 64, 128, 256],
                   "d_out": 64, "scales": [0, 1, 2, 3]})


def test_depth_decoder_parity_vs_reference():
    """DepthDecoder (sigmoid disparity variant, reference
    monodepth2.py:110-169): functional parity with the actual reference
    module under transferred weights."""
    from reference_oracle import load_reference
    from behindthescenes_tpu.models.encoder import DepthDecoder
    from behindthescenes_tpu.import_torch import (_map_monodepth_decoder,
                                                  load_torch_state_dict)
    import tempfile, os
    ref = load_reference()
    torch.manual_seed(4)
    num_ch_enc = [64, 64, 128, 256, 512]
    tdec = ref.bts.__class__  # unused; import module directly
    import models.common.backbones.monodepth2 as ref_md2
    tdec = ref_md2.DepthDecoder(np.array(num_ch_enc)).eval()

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "dec.pt")
        torch.save(tdec.state_dict(), p)
        sd = load_torch_state_dict(p)
        params = _map_monodepth_decoder(sd, "")

    rng = np.random.default_rng(5)
    h, w = 64, 96   # pyramid levels at strides 2..32
    feats, tfeats = [], []
    for i, c in enumerate(num_ch_enc):
        f = rng.uniform(-1, 1,
                        (1, h >> (i + 1), w >> (i + 1), c)).astype(np.float32)
        feats.append(jnp.asarray(f))
        tfeats.append(torch.from_numpy(np.transpose(f, (0, 3, 1, 2))))

    jdec = DepthDecoder()
    out = jdec.apply({"params": params}, feats)
    with torch.no_grad():
        tout = tdec(tfeats)
    for s in range(4):
        theirs = np.transpose(tout[("disp", s)].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(out[("disp", s)]), theirs,
                                   atol=1e-5, err_msg=f"disp scale {s}")


def test_multi_image_stem_import_and_forward(tv_resnet18_ckpt):
    """resnet_multiimage_input parity (reference monodepth2.py:26-68):
    conv1 tiled over stacked frames / num_images; the flax encoder accepts
    the stacked input directly."""
    path, tmodel = tv_resnet18_ckpt
    from behindthescenes_tpu.import_torch import load_encoder_checkpoint
    sub_p, sub_s = load_encoder_checkpoint(path, resnet_layers=18,
                                           num_input_images=2)
    k = sub_p["encoder"]["conv1"]["kernel"]
    assert k.shape == (7, 7, 6, 64)

    enc = ResnetEncoder(num_layers=18)
    x = np.random.default_rng(1).uniform(0, 1, (1, 64, 64, 6)) \
        .astype(np.float32)
    feats = enc.apply({"params": sub_p["encoder"],
                       "batch_stats": sub_s["encoder"]}, jnp.asarray(x))
    # Identical stacked frames behave like the single-image stem.
    single = enc.apply(
        {"params": load_encoder_checkpoint(path, 18)[0]["encoder"],
         "batch_stats": sub_s["encoder"]},
        jnp.asarray(np.concatenate([x[..., :3]], -1)))
    x_same = np.concatenate([x[..., :3], x[..., :3]], -1)
    feats_same = enc.apply({"params": sub_p["encoder"],
                            "batch_stats": sub_s["encoder"]},
                           jnp.asarray(x_same))
    np.testing.assert_allclose(np.asarray(feats_same[4]),
                               np.asarray(single[4]), atol=1e-4)
    assert np.isfinite(np.asarray(feats[4])).all()
