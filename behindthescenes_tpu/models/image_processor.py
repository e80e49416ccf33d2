"""Image processors that define the supervision signal
(reference models/bts/model/image_processor.py:9-110).

A processor maps encoder-normalized images (n, v, h, w, 3) in [-1, 1] to the
channel space the reconstruction loss operates in.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RGBProcessor:
    """[-1, 1] -> [0, 1] RGB (reference image_processor.py:22-29)."""
    channels: int = 3

    def __call__(self, images):
        return images * 0.5 + 0.5


@dataclasses.dataclass(frozen=True)
class PatchProcessor:
    """Unfold p×p neighborhoods into channels
    (reference image_processor.py:69-93)."""
    patch_size: int = 3

    @property
    def channels(self) -> int:
        return 3 * self.patch_size ** 2

    def __call__(self, images):
        n, v, h, w, c = images.shape
        p = self.patch_size
        images = images * 0.5 + 0.5
        pad = [(0, 0), (0, 0), (p // 2, p // 2), (p // 2, p // 2), (0, 0)]
        x = jnp.pad(images, pad, mode="edge")
        patches = [x[:, :, dy:dy + h, dx:dx + w, :]
                   for dy in range(p) for dx in range(p)]
        return jnp.concatenate(patches, axis=-1)


class PerceptualProcessor:
    """LPIPS-VGG feature channels as the supervision space
    (reference image_processor.py:32-66): unit-normalized activations of
    the first `layers` VGG stages, resized to image resolution.

    Needs local VGG weights (see scripts/convert_lpips_weights.py);
    zero-egress environments without them get a clear error.
    """

    def __init__(self, layers: int = 1, weights=None):
        from behindthescenes_tpu.evaluation.metrics import LPIPSVGG
        self._vgg = LPIPSVGG.maybe_create(weights)
        if self._vgg is None:
            raise NotImplementedError(
                "perceptual image processor needs LPIPS-VGG weights: set "
                "BTS_LPIPS_WEIGHTS (scripts/convert_lpips_weights.py)")
        self._layers = layers
        self.channels = sum(LPIPSVGG.CHANNELS[:layers])

    def __call__(self, images):
        n, v, h, w, c = images.shape
        x = images.reshape(n * v, h, w, c)
        feats = self._vgg.features(x, num_stages=self._layers)
        outs = []
        for f in feats:
            norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True)) + 1e-10
            f = f / norm
            if f.shape[1:3] != (h, w):
                ys = (jnp.arange(h) * (f.shape[1] / h)).astype(jnp.int32)
                xs = (jnp.arange(w) * (f.shape[2] / w)).astype(jnp.int32)
                f = f[:, ys][:, :, xs]
            outs.append(f)
        out = jnp.concatenate(outs, axis=-1)
        return out.reshape(n, v, h, w, self.channels)


def make_image_processor(conf: dict):
    """Factory (reference image_processor.py:9-19)."""
    ptype = conf.get("type", "rgb").lower()
    if ptype == "rgb":
        return RGBProcessor()
    if ptype == "patch":
        return PatchProcessor(conf.get("patch_size", 3))
    if ptype == "perceptual":
        return PerceptualProcessor(conf.get("layers", 1),
                                   conf.get("weights"))
    raise NotImplementedError(f"Unsupported image processor: {ptype}")
