"""Image encoders emitting pixel-aligned feature maps.

TPU-native re-design of the reference's monodepth2 backbone
(models/common/backbones/monodepth2.py:26-302): a ResNet-18/50 encoder with a
U-Net decoder that outputs `d_out`-channel latents at scales 0..3. NHWC layout
throughout; convs run in bf16 on the MXU when `compute_dtype=bfloat16` while
parameters and BN stats stay f32.

Also provides the alternative backbones from the reference:
  * SpatialEncoder (pixelNeRF-style multi-layer latents, spatial_encoder.py)
  * ImageEncoder (global latent vector, image_encoder.py)
and the `make_backbone` factory (backbone_util.py:6-16).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class _ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    kernel_init=_conv_init, dtype=self.compute_dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return x


class BasicBlock(nn.Module):
    """ResNet-18/34 block."""
    features: int
    stride: int = 1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = _ConvBN(self.features, 3, self.stride,
                      self.compute_dtype, name="conv1")(x, train)
        out = nn.relu(out)
        out = _ConvBN(self.features, 3, 1, self.compute_dtype,
                      name="conv2")(out, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = _ConvBN(self.features, 1, self.stride,
                               self.compute_dtype, name="downsample")(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """ResNet-50 block (expansion 4)."""
    features: int
    stride: int = 1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = nn.relu(_ConvBN(self.features, 1, 1, self.compute_dtype,
                              name="conv1")(x, train))
        out = nn.relu(_ConvBN(self.features, 3, self.stride,
                              self.compute_dtype, name="conv2")(out, train))
        out = _ConvBN(self.features * 4, 1, 1, self.compute_dtype,
                      name="conv3")(out, train)
        if self.stride != 1 or x.shape[-1] != self.features * 4:
            identity = _ConvBN(self.features * 4, 1, self.stride,
                               self.compute_dtype, name="downsample")(x, train)
        return nn.relu(out + identity)


_RESNET_SPECS = {
    18: (BasicBlock, (2, 2, 2, 2), (64, 64, 128, 256, 512)),
    34: (BasicBlock, (3, 4, 6, 3), (64, 64, 128, 256, 512)),
    50: (Bottleneck, (3, 4, 6, 3), (64, 256, 512, 1024, 2048)),
}


class ResnetEncoder(nn.Module):
    """5-level ResNet feature pyramid (reference monodepth2.py:71-107).

    Input images are in [0, 1]; normalization (x - 0.45) / 0.225 matches the
    reference. Returns features at strides [2, 4, 8, 16, 32].
    """
    num_layers: int = 18
    compute_dtype: Any = jnp.float32

    @property
    def num_ch_enc(self) -> Sequence[int]:
        return _RESNET_SPECS[self.num_layers][2]

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, layers, _ = _RESNET_SPECS[self.num_layers]
        x = (x - 0.45) / 0.225
        x = x.astype(self.compute_dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=_conv_init,
                    dtype=self.compute_dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(x)
        feats = [nn.relu(x)]
        x = nn.max_pool(feats[-1], (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        widths = (64, 128, 256, 512)
        for stage, (n_blocks, width) in enumerate(zip(layers, widths)):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = block(width, stride, self.compute_dtype,
                          name=f"layer{stage + 1}_{b}")(x, train)
            feats.append(x)
        return feats


class ConvBlock3x3(nn.Module):
    """Reflect-padded 3x3 conv + ELU (reference layers.py:11-41)."""
    features: int
    elu: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        x = nn.Conv(self.features, (3, 3), padding="VALID",
                    dtype=self.compute_dtype, name="conv")(x)
        return nn.elu(x) if self.elu else x


def _upsample_nearest(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class Decoder(nn.Module):
    """U-Net decoder emitting multi-scale latents
    (reference monodepth2.py:172-239)."""
    num_ch_dec: Sequence[int] = (128, 128, 256, 256, 512)
    d_out: int = 128
    scales: Sequence[int] = (0, 1, 2, 3)
    use_skips: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_features):
        num_ch_dec = [max(self.d_out, c) for c in self.num_ch_dec]
        outputs = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock3x3(num_ch_dec[i], compute_dtype=self.compute_dtype,
                             name=f"upconv_{i}_0")(x)
            x = _upsample_nearest(x)
            if self.use_skips and i > 0:
                feats = input_features[i - 1]
                x = x[:, :feats.shape[1], :feats.shape[2], :]
                x = jnp.concatenate([x, feats], axis=-1)
            x = ConvBlock3x3(num_ch_dec[i], compute_dtype=self.compute_dtype,
                             name=f"upconv_{i}_1")(x)
            if i in self.scales:
                outputs[i] = ConvBlock3x3(
                    self.d_out, elu=False, compute_dtype=self.compute_dtype,
                    name=f"dispconv_{i}")(x)
        return outputs


class DepthDecoder(nn.Module):
    """Sigmoid-disparity U-Net decoder (reference monodepth2.py:110-169).

    Unused by shipped BTS configs (they use `Decoder` latents) but part of
    the monodepth2 backbone surface: emits `("disp", i)` sigmoid disparity
    maps and `("features", i)` per scale. Weight schema matches the
    reference ModuleList layout (import via
    import_torch._map_monodepth_decoder).
    """
    num_ch_dec: Sequence[int] = (16, 32, 64, 128, 256)
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_features):
        outputs = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock3x3(self.num_ch_dec[i],
                             compute_dtype=self.compute_dtype,
                             name=f"upconv_{i}_0")(x)
            x = _upsample_nearest(x)
            if self.use_skips and i > 0:
                feats = input_features[i - 1]
                x = x[:, :feats.shape[1], :feats.shape[2], :]
                x = jnp.concatenate([x, feats], axis=-1)
            x = ConvBlock3x3(self.num_ch_dec[i],
                             compute_dtype=self.compute_dtype,
                             name=f"upconv_{i}_1")(x)
            outputs[("features", i)] = x
            if i in self.scales:
                d = ConvBlock3x3(self.num_output_channels, elu=False,
                                 compute_dtype=self.compute_dtype,
                                 name=f"dispconv_{i}")(x)
                outputs[("disp", i)] = nn.sigmoid(d)
        return outputs


class Monodepth2(nn.Module):
    """Default backbone: ResNet encoder + U-Net decoder
    (reference monodepth2.py:242-302).

    Input images in [-1, 1], NHWC. Returns a list of per-scale latents
    [scale0 (full/2^0 of decoder output), scale1, ...] in f32.
    """
    resnet_layers: int = 18
    num_ch_dec: Sequence[int] | None = None
    d_out: int = 128
    scales: Sequence[int] = (0, 1, 2, 3)
    freeze: bool = False
    compute_dtype: Any = jnp.float32

    @property
    def latent_size(self) -> int:
        return self.d_out

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x * 0.5 + 0.5
        feats = ResnetEncoder(self.resnet_layers, self.compute_dtype,
                              name="encoder")(x, train)
        num_ch_dec = tuple(self.num_ch_dec) if self.num_ch_dec is not None \
            else (128, 128, 256, 256, 512)
        outputs = Decoder(num_ch_dec, self.d_out, tuple(self.scales),
                          compute_dtype=self.compute_dtype,
                          name="decoder")(feats)
        latents = [outputs[i].astype(jnp.float32) for i in self.scales]
        if self.freeze:
            # Reference `freeze` sets requires_grad=False on the whole
            # backbone (monodepth2.py:275-277). Cutting the gradient at the
            # output is equivalent for Adam-from-init AND skips the entire
            # CNN backward pass. (BN running stats still update in train
            # mode, matching the reference's train()-mode behavior.)
            latents = [jax.lax.stop_gradient(l) for l in latents]
        return latents


class SpatialEncoder(nn.Module):
    """pixelNeRF-style multi-layer latent encoder
    (reference spatial_encoder.py:16-157). Latents from the first
    `num_layers` ResNet stages are upsampled to stride-2 resolution and
    concatenated."""
    resnet_layers: int = 34
    num_layers: int = 4
    compute_dtype: Any = jnp.float32

    @property
    def latent_size(self) -> int:
        chans = _RESNET_SPECS[self.resnet_layers][2]
        return sum(chans[:self.num_layers])

    @property
    def scales(self) -> Sequence[int]:
        return (0,)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x * 0.5 + 0.5
        feats = ResnetEncoder(self.resnet_layers, self.compute_dtype,
                              name="encoder")(x, train)
        target_hw = feats[0].shape[1:3]
        latents = []
        for f in feats[:self.num_layers]:
            fh, fw = f.shape[1:3]
            rep_h = target_hw[0] // fh
            rep_w = target_hw[1] // fw
            up = jnp.repeat(jnp.repeat(f, rep_h, axis=1), rep_w, axis=2)
            latents.append(up[:, :target_hw[0], :target_hw[1]])
        return [jnp.concatenate(latents, axis=-1).astype(jnp.float32)]


class ImageEncoder(nn.Module):
    """Global single-vector latent (reference image_encoder.py:14-67)."""
    resnet_layers: int = 34
    latent_dim: int = 128
    compute_dtype: Any = jnp.float32

    @property
    def latent_size(self) -> int:
        return self.latent_dim

    @property
    def scales(self) -> Sequence[int]:
        return (0,)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x * 0.5 + 0.5
        feats = ResnetEncoder(self.resnet_layers, self.compute_dtype,
                              name="encoder")(x, train)
        pooled = jnp.mean(feats[-1], axis=(1, 2))
        out = nn.Dense(self.latent_dim, name="fc")(pooled)
        return [out.astype(jnp.float32)]


class EncoderDummy(nn.Module):
    """Learned constant feature map replacing the CNN — the overfit debug
    harness (reference models/bts/trainer_overfit.py:24-33)."""
    size: Sequence[int] = (48, 160)
    d_out: int = 64

    @property
    def latent_size(self) -> int:
        return self.d_out

    @property
    def scales(self) -> Sequence[int]:
        return (0,)

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = x.shape[0]
        feat = self.param("feats", nn.initializers.normal(1.0),
                          (self.size[0], self.size[1], self.d_out))
        return [jnp.broadcast_to(feat, (n,) + feat.shape)]


_BACKBONE_KEYS = {
    "monodepth2": {"type", "remat", "resnet_layers", "num_ch_dec", "d_out",
                   "scales", "pretrained", "pretrained_strict", "freeze",
                   "cp_location"},
    "spatial": {"type", "resnet_layers", "num_layers", "pretrained"},
    "global": {"type", "resnet_layers", "latent_size", "pretrained"},
    "dummy": {"type", "size", "d_out"},
}


def make_backbone(conf: dict, compute_dtype=jnp.float32):
    """Backbone factory (reference backbone_util.py:6-16).

    conf["remat"]: rematerialize the CNN in the backward pass
    (jax.checkpoint) — trades ~30% step time for the encoder's activation
    memory, the difference between batch 4 and batch 16 fitting on a 16GB
    chip at 192x640.

    conf["pretrained"] / conf["cp_location"] are consumed at INIT time by
    `import_torch.apply_pretrained_encoder` (the module itself is static
    config); they are validated here so configs cannot carry dead keys.
    conf["freeze"] stops gradients at the backbone output
    (reference monodepth2.py:275-277 requires_grad=False).
    """
    btype = conf.get("type", "monodepth2")
    if btype not in _BACKBONE_KEYS:
        raise NotImplementedError(f"Unsupported encoder type: {btype}")
    unknown = set(conf) - _BACKBONE_KEYS[btype]
    if unknown:
        raise ValueError(
            f"unknown encoder config keys for type={btype}: "
            f"{sorted(unknown)} (known: {sorted(_BACKBONE_KEYS[btype])})")
    remat = conf.get("remat", False)
    if btype == "monodepth2":
        cls = nn.remat(Monodepth2, static_argnums=(2,)) if remat \
            else Monodepth2
        return cls(
            resnet_layers=conf.get("resnet_layers", 18),
            num_ch_dec=conf.get("num_ch_dec", None),
            d_out=conf.get("d_out", 128),
            scales=tuple(conf.get("scales", (0, 1, 2, 3))),
            freeze=conf.get("freeze", False),
            compute_dtype=compute_dtype,
        )
    if btype == "spatial":
        return SpatialEncoder(
            resnet_layers=conf.get("resnet_layers", 34),
            num_layers=conf.get("num_layers", 4),
            compute_dtype=compute_dtype,
        )
    if btype == "dummy":
        return EncoderDummy(
            size=tuple(conf.get("size", (48, 160))),
            d_out=conf.get("d_out", 64),
        )
    return ImageEncoder(
        resnet_layers=conf.get("resnet_layers", 34),
        latent_dim=conf.get("latent_size", 128),
        compute_dtype=compute_dtype,
    )
