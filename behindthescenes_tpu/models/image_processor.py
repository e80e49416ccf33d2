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


def make_image_processor(conf: dict):
    """Factory (reference image_processor.py:9-19)."""
    ptype = conf.get("type", "rgb")
    if ptype == "rgb":
        return RGBProcessor()
    if ptype == "patch":
        return PatchProcessor(conf.get("patch_size", 3))
    if ptype == "perceptual":
        raise NotImplementedError(
            "perceptual image processor requires the LPIPS-VGG port "
            "(planned; reference image_processor.py:32-66)")
    raise NotImplementedError(f"Unsupported image processor: {ptype}")
