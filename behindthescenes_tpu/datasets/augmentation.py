"""Color augmentation (reference utils/augmentation.py:3-18 +
torchvision ColorJitter semantics), numpy/cv2-native.

A jitter is sampled once per data sample and applied identically to every
view (brightness/contrast/saturation scale factors and a hue rotation, in a
random order), matching the reference's per-sample `get_params` closure.

The per-op math is the torchvision float formulation; the implementation
uses cv2 SIMD primitives and in-place numpy ops because the jitter runs on
the host data path for every view of every sample (8 views/sample on
KITTI-360) — the straightforward chained-numpy version costs ~20 ms per
192x640 image on a small host, this one ~5 ms (exact to float rounding;
tests/test_augmentation.py pins parity against the naive formulation).
"""
from __future__ import annotations

import cv2
import numpy as np

# ITU-R 601 grayscale weights (torchvision rgb_to_grayscale).
_GRAY_W = np.array([[0.299, 0.587, 0.114]], np.float32)


def sample_color_jitter(rng: np.random.Generator,
                        brightness=(0.8, 1.2), contrast=(0.8, 1.2),
                        saturation=(0.8, 1.2), hue=(-0.1, 0.1)):
    """Returns a function (h, w, 3) float32 [0,1] -> jittered image.

    The rng stream (permutation, then b/c/s/h uniforms) is part of the
    data pipeline's reproducibility contract — do not reorder draws.
    """
    order = rng.permutation(4)
    b = float(rng.uniform(*brightness))
    c = float(rng.uniform(*contrast))
    s = float(rng.uniform(*saturation))
    h = float(rng.uniform(*hue))

    def adjust_brightness(img):
        # clamp(img * b)
        np.multiply(img, b, out=img)
        return np.clip(img, 0.0, 1.0, out=img)

    def adjust_contrast(img):
        # clamp((img - gm) * c + gm) with gm the scalar grayscale mean.
        # mean(0.299 r + 0.587 g + 0.114 b) == dot(channel means, w).
        gm = float(img.mean(axis=(0, 1)) @ _GRAY_W[0])
        np.multiply(img, c, out=img)
        img += (1.0 - c) * gm
        return np.clip(img, 0.0, 1.0, out=img)

    def adjust_saturation(img):
        # clamp((img - gray) * s + gray) == clamp(img*s + gray*(1-s))
        # with gray the per-pixel grayscale image.
        gray3 = cv2.cvtColor(cv2.transform(img, _GRAY_W),
                             cv2.COLOR_GRAY2RGB)
        out = cv2.addWeighted(img, s, gray3, 1.0 - s, 0.0, dst=img)
        return np.clip(out, 0.0, 1.0, out=out)

    def adjust_hue(img):
        hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
        hch = hsv[..., 0]
        hch += h * 360.0
        np.mod(hch, 360.0, out=hch)
        out = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
        return np.clip(out, 0.0, 1.0, out=out)

    fns = [adjust_brightness, adjust_contrast, adjust_saturation, adjust_hue]

    def apply(img):
        # One up-front copy so callers' arrays are never mutated; every
        # stage then runs in place on the scratch buffer.
        img = np.ascontiguousarray(img, dtype=np.float32).copy()
        for i in order:
            img = fns[i](img)
        return img

    return apply
