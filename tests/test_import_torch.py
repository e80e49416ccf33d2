"""Checkpoint importer tests: build a reference-shaped torch model, import
its state dict, and check FUNCTIONAL parity of the Flax modules (not just
shapes). Torch modules here re-create the reference's architecture
(monodepth2.py:26-302, resnetfc.py:10-132) for oracle purposes.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from behindthescenes_tpu.import_torch import (import_bts_checkpoint,
                                              validate_against_template)
from behindthescenes_tpu.models.encoder import Monodepth2
from behindthescenes_tpu.models.bts import BTSNet


# ---------------------------------------------------------------- torch side
class TBasicBlock(torch.nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idn)


class TResnet18(torch.nn.Module):
    """torchvision-style resnet18 (keys conv1/bn1/layerN.M...)."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        cin = 64
        for s, w in enumerate(widths):
            blocks = []
            for b in range(2):
                stride = 2 if (b == 0 and s > 0) else 1
                blocks.append(TBasicBlock(cin, w, stride))
                cin = w
            setattr(self, f"layer{s + 1}", torch.nn.Sequential(*blocks))

    def forward(self, x):
        feats = [F.relu(self.bn1(self.conv1(x)))]
        feats.append(self.layer1(self.maxpool(feats[-1])))
        feats.append(self.layer2(feats[-1]))
        feats.append(self.layer3(feats[-1]))
        feats.append(self.layer4(feats[-1]))
        return feats


class TConv3x3(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.pad = torch.nn.ReflectionPad2d(1)
        self.conv = torch.nn.Conv2d(cin, cout, 3)

    def forward(self, x):
        return self.conv(self.pad(x))


class TConvBlock(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TConv3x3(cin, cout)

    def forward(self, x):
        return F.elu(self.conv(x))


class TDecoder(torch.nn.Module):
    """Reference Decoder (monodepth2.py:172-239) with ModuleList layout."""

    def __init__(self, num_ch_enc, num_ch_dec, d_out, scales=(0, 1, 2, 3)):
        super().__init__()
        num_ch_dec = [max(d_out, c) for c in num_ch_dec]
        self.num_ch_dec = num_ch_dec
        self.scales = scales
        convs = []
        self.keys = {}
        for i in range(4, -1, -1):
            cin = num_ch_enc[-1] if i == 4 else num_ch_dec[i + 1]
            self.keys[("upconv", i, 0)] = len(convs)
            convs.append(TConvBlock(cin, num_ch_dec[i]))
            cin = num_ch_dec[i] + (num_ch_enc[i - 1] if i > 0 else 0)
            self.keys[("upconv", i, 1)] = len(convs)
            convs.append(TConvBlock(cin, num_ch_dec[i]))
        for s in scales:
            self.keys[("dispconv", s)] = len(convs)
            convs.append(TConv3x3(num_ch_dec[s], d_out))
        self.decoder = torch.nn.ModuleList(convs)

    def forward(self, feats):
        outputs = {}
        x = feats[-1]
        for i in range(4, -1, -1):
            x = self.decoder[self.keys[("upconv", i, 0)]](x)
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            if i > 0:
                s = feats[i - 1]
                x = x[:, :, :s.shape[2], :s.shape[3]]
                x = torch.cat([x, s], 1)
            x = self.decoder[self.keys[("upconv", i, 1)]](x)
            if i in self.scales:
                outputs[i] = self.decoder[self.keys[("dispconv", i)]](x)
        return outputs


class TMonodepth2(torch.nn.Module):
    def __init__(self, d_out=16, num_ch_dec=(16, 16, 32, 32, 64)):
        super().__init__()

        class _Enc(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.encoder = TResnet18()

            def forward(self, x):
                return self.encoder((x - 0.45) / 0.225)

        self.encoder = _Enc()
        self.decoder = TDecoder([64, 64, 128, 256, 512], list(num_ch_dec),
                                d_out)

    def forward(self, x):
        x = x * 0.5 + 0.5
        feats = self.encoder(x)
        out = self.decoder(feats)
        return [out[i] for i in range(4)]


class TResnetFC(torch.nn.Module):
    def __init__(self, d_in, d_out, d_hidden, n_blocks=0):
        super().__init__()
        self.lin_in = torch.nn.Linear(d_in, d_hidden)
        self.lin_out = torch.nn.Linear(d_hidden, d_out)
        self.blocks = torch.nn.ModuleList([])

    def forward(self, x):
        return self.lin_out(F.relu(self.lin_in(x)))


class TBTS(torch.nn.Module):
    def __init__(self, d_latent=16, d_code=27, d_hidden=32):
        super().__init__()
        self.encoder = TMonodepth2(d_out=d_latent)
        self.mlp_coarse = TResnetFC(d_latent + d_code, 1, d_hidden)


@pytest.fixture(scope="module")
def torch_ckpt(tmp_path_factory):
    torch.manual_seed(0)
    model = TBTS().eval()
    # Run a forward in train mode to move BN running stats off-default.
    model.train()
    with torch.no_grad():
        model.encoder(torch.randn(2, 3, 64, 96))
    model.eval()
    path = tmp_path_factory.mktemp("ckpt") / "training_10.pt"
    sd = {"renderer.net." + k: v for k, v in model.state_dict().items()}
    torch.save({"model": sd}, str(path))
    return str(path), model


def test_import_and_encoder_parity(torch_ckpt):
    path, tmodel = torch_ckpt
    params, batch_stats = import_bts_checkpoint(path, resnet_layers=18)

    enc = Monodepth2(resnet_layers=18, d_out=16,
                     num_ch_dec=(16, 16, 32, 32, 64))
    x = np.random.default_rng(0).uniform(-1, 1, (1, 64, 96, 3)) \
        .astype(np.float32)
    variables = {"params": params["encoder"],
                 "batch_stats": batch_stats["encoder"]}
    feats = enc.apply(variables, jnp.asarray(x))

    with torch.no_grad():
        tfeats = tmodel.encoder(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2))))

    for s in range(4):
        ours = np.asarray(feats[s])
        theirs = np.transpose(tfeats[s].numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(ours, theirs, atol=2e-3,
                                   err_msg=f"scale {s}")


def test_import_full_bts_and_validate(torch_ckpt):
    path, tmodel = torch_ckpt
    params, batch_stats = import_bts_checkpoint(path, resnet_layers=18)

    net = BTSNet(
        z_near=3.0, z_far=80.0,
        encoder_conf={"type": "monodepth2", "resnet_layers": 18,
                      "num_ch_dec": (16, 16, 32, 32, 64), "d_out": 16},
        code_conf={"num_freqs": 4, "freq_factor": 1.5},
        mlp_coarse_conf={"type": "resnet", "n_blocks": 0, "d_hidden": 32},
        mlp_fine_conf={"type": "empty"},
        learn_empty=False,
    )
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 2, 64, 96, 3)),
                         dtype=jnp.float32)
    poses = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4))
    ks = jnp.broadcast_to(jnp.asarray(
        [[0.8, 0, 0], [0, 1.1, 0], [0, 0, 1.0]]), (1, 2, 3, 3))
    template = net.init(jax.random.PRNGKey(0), images, ks, poses,
                        jnp.zeros((1, 4, 3)))
    validate_against_template(params, template["params"])

    # End to end: encode + query runs with imported weights.
    variables = {"params": params, "batch_stats": batch_stats}
    grid = net.apply(variables, images, ks, poses, method=BTSNet.encode)
    xyz = jnp.asarray(rng.uniform(-1, 1, (1, 32, 3)) + np.array([0, 0, 10.0]),
                      dtype=jnp.float32)
    rgb, invalid, sigma = net.apply(variables, grid, xyz,
                                    method=BTSNet.query)
    assert np.isfinite(np.asarray(sigma)).all()

    # MLP parity against the torch oracle.
    feats_codes = rng.uniform(-1, 1, (8, 16 + 27)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel.mlp_coarse(torch.from_numpy(feats_codes)).numpy()
    ours = net.apply({"params": params}, jnp.asarray(feats_codes),
                     method=lambda m, x: m.mlp_coarse(x))
    np.testing.assert_allclose(np.asarray(ours), t_out, atol=1e-5)
