"""Load the ACTUAL reference implementation (/root/reference) as a torch-CPU
golden oracle for end-to-end parity tests.

The reference environment ships torchvision / dotmap / omegaconf, which are
absent here; this module installs minimal functional stand-ins (a
torchvision-key-compatible ResNet, a DotMap dict, ListConfig) into
sys.modules *before* putting /root/reference on sys.path, so the reference's
own `models/` package imports unmodified. The reference code is executed as
an oracle only — its outputs are compared against ours, nothing more.

Used by tests/test_reference_parity.py (VERDICT round-1 item 1: golden
end-to-end parity against the local reference).
"""
from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


# --------------------------------------------------------------- torchvision
def _build_torchvision_stub():
    """A torchvision.models.resnet replica (public architecture spec) with
    EXACT torchvision module naming, so the reference's ResnetEncoder
    (monodepth2.py:74-107) and our import_torch key mapping both apply."""
    import torch
    import torch.nn as nn

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + identity)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, block, layers, num_classes=1000):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(block, 64, layers[0])
            self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
            self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
            self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * block.expansion, num_classes)

        def _make_layer(self, block, planes, blocks, stride=1):
            downsample = None
            if stride != 1 or self.inplanes != planes * block.expansion:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                              stride, bias=False),
                    nn.BatchNorm2d(planes * block.expansion))
            layers = [block(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * block.expansion
            for _ in range(1, blocks):
                layers.append(block(self.inplanes, planes))
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = torch.flatten(self.avgpool(x), 1)
            return self.fc(x)

    def _factory(block, layers):
        def make(pretrained=False, **kwargs):
            # `pretrained` is accepted (the reference hardcodes True,
            # monodepth2.py:91) but ignored: parity tests transfer explicit
            # state dicts; no network access exists here.
            return ResNet(block, layers, **kwargs)
        return make

    resnet_mod = types.ModuleType("torchvision.models.resnet")
    resnet_mod.BasicBlock = BasicBlock
    resnet_mod.Bottleneck = Bottleneck
    resnet_mod.ResNet = ResNet
    resnet_mod.model_urls = {f"resnet{n}": f"stub://resnet{n}"
                             for n in (18, 34, 50, 101, 152)}

    models_mod = types.ModuleType("torchvision.models")
    models_mod.resnet = resnet_mod
    models_mod.ResNet = ResNet
    models_mod.resnet18 = _factory(BasicBlock, [2, 2, 2, 2])
    models_mod.resnet34 = _factory(BasicBlock, [3, 4, 6, 3])
    models_mod.resnet50 = _factory(Bottleneck, [3, 4, 6, 3])
    models_mod.resnet101 = _factory(Bottleneck, [3, 4, 23, 3])
    models_mod.resnet152 = _factory(Bottleneck, [3, 8, 36, 3])

    class _LazyErrModule(types.ModuleType):
        def __getattr__(self, name):
            # AttributeError (not NotImplementedError): generic module
            # introspection — e.g. `inspect`'s hasattr(mod, "__file__") walk
            # of sys.modules inside torch warning plumbing — must see a
            # normal missing attribute, not an error.
            raise AttributeError(
                f"torchvision stub: {self.__name__}.{name} is not implemented"
                " (only models.resnet* is)")

    transforms_mod = _LazyErrModule("torchvision.transforms")

    tv = types.ModuleType("torchvision")
    tv.models = models_mod
    tv.transforms = transforms_mod
    return tv, models_mod, resnet_mod, transforms_mod


# -------------------------------------------------------------------- dotmap
class DotMap(dict):
    """Attribute-access dict; enough of the dotmap API for nerf.py."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        for k, v in list(self.items()):
            if isinstance(v, dict) and not isinstance(v, DotMap):
                self[k] = DotMap(v)

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    def toDict(self):
        return {k: (v.toDict() if isinstance(v, DotMap) else v)
                for k, v in self.items()}


def install_stubs():
    if "torchvision" not in sys.modules:
        tv, models_mod, resnet_mod, transforms_mod = _build_torchvision_stub()
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models_mod
        sys.modules["torchvision.models.resnet"] = resnet_mod
        sys.modules["torchvision.transforms"] = transforms_mod
    if "dotmap" not in sys.modules:
        dm = types.ModuleType("dotmap")
        dm.DotMap = DotMap
        sys.modules["dotmap"] = dm
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")

        class ListConfig(list):
            pass

        oc.ListConfig = ListConfig
        sys.modules["omegaconf"] = oc
    if "lpips" not in sys.modules:
        lp = types.ModuleType("lpips")

        class LPIPS:  # referenced by image_processor.py; never constructed
            def __init__(self, *a, **k):
                raise NotImplementedError("lpips stub: no weights in-env")

        lp.LPIPS = LPIPS
        sys.modules["lpips"] = lp


_cached = None


def load_reference():
    """Import the reference's model/render/loss modules; returns a namespace.

    Importing `models.*` resolves against /root/reference (the name does not
    collide with our package, which lives under behindthescenes_tpu.models).
    """
    global _cached
    if _cached is not None:
        return _cached
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import models.bts.model.models_bts as ref_bts            # noqa: E402
    import models.common.render.nerf as ref_nerf              # noqa: E402
    import models.bts.model.loss as ref_loss                  # noqa: E402
    import models.bts.model.ray_sampler as ref_ray_sampler    # noqa: E402
    import models.common.util.util as ref_util                # noqa: E402
    import utils.projection_operations as ref_proj            # noqa: E402
    _cached = types.SimpleNamespace(
        bts=ref_bts, nerf=ref_nerf, loss=ref_loss,
        ray_sampler=ref_ray_sampler, util=ref_util, proj=ref_proj)
    return _cached


# Flagship model config (reference configs/exp_kitti_raw.yaml:23-66), shared
# by both stacks in the parity tests. Image size is shrunk for test speed —
# every code path is shape-generic.
FLAGSHIP_MODEL_CONF = {
    "arch": "BTSNet",
    "use_code": True,
    "prediction_mode": "default",
    "code": {"num_freqs": 6, "freq_factor": 1.5, "include_input": True},
    "encoder": {"type": "monodepth2", "freeze": False, "pretrained": False,
                "resnet_layers": 50, "num_ch_dec": [32, 32, 64, 128, 256],
                "d_out": 64},
    "mlp_coarse": {"type": "resnet", "n_blocks": 0, "d_hidden": 64},
    "mlp_fine": {"type": "empty", "n_blocks": 1, "d_hidden": 128},
    "z_near": 3, "z_far": 80, "inv_z": True,
    "learn_empty": False, "code_mode": "z",
}

FLAGSHIP_RENDERER_CONF = {
    "n_coarse": 64, "n_fine": 0, "n_fine_depth": 0, "depth_std": 1.0,
    "sched": [], "white_bkgd": False, "lindisp": True,
    "hard_alpha_cap": True,
}

FLAGSHIP_LOSS_CONF = {
    "criterion": "l1+ssim", "invalid_policy": "weight_guided",
    "lambda_edge_aware_smoothness": 0.001,
}
