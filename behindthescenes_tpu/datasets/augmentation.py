"""Color augmentation (reference utils/augmentation.py:3-18 +
torchvision ColorJitter semantics), numpy-native.

A jitter is sampled once per data sample and applied identically to every
view (brightness/contrast/saturation scale factors and a hue rotation, in a
random order), matching the reference's per-sample `get_params` closure.
"""
from __future__ import annotations

import numpy as np


def sample_color_jitter(rng: np.random.Generator,
                        brightness=(0.8, 1.2), contrast=(0.8, 1.2),
                        saturation=(0.8, 1.2), hue=(-0.1, 0.1)):
    """Returns a function (h, w, 3) float [0,1] -> jittered image."""
    order = rng.permutation(4)
    b = rng.uniform(*brightness)
    c = rng.uniform(*contrast)
    s = rng.uniform(*saturation)
    h = rng.uniform(*hue)

    def adjust_brightness(img):
        return np.clip(img * b, 0.0, 1.0)

    def adjust_contrast(img):
        mean = img.mean(axis=(0, 1), keepdims=True).mean()
        # torchvision uses the grayscale mean
        gray = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                + 0.114 * img[..., 2]).mean()
        return np.clip((img - gray) * c + gray, 0.0, 1.0)

    def adjust_saturation(img):
        gray = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                + 0.114 * img[..., 2])[..., None]
        return np.clip((img - gray) * s + gray, 0.0, 1.0)

    def adjust_hue(img):
        import cv2
        hsv = cv2.cvtColor(img.astype(np.float32), cv2.COLOR_RGB2HSV)
        hsv[..., 0] = (hsv[..., 0] + h * 360.0) % 360.0
        return np.clip(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB), 0.0, 1.0)

    fns = [adjust_brightness, adjust_contrast, adjust_saturation, adjust_hue]

    def apply(img):
        for i in order:
            img = fns[i](img)
        return img

    return apply
