"""Image-quality metrics for NVS evaluation (host-side numpy).

PSNR and a skimage-compatible SSIM (uniform 7x7 window, sample-covariance
normalization) reproduce `skimage.metrics.peak_signal_noise_ratio` /
`structural_similarity` used by the reference (evaluator.py:178-179) without
the skimage dependency. LPIPS is architecture-complete but needs pretrained
VGG weights supplied locally (zero-egress environment): see LPIPSVGG.
"""
from __future__ import annotations

import numpy as np


def psnr(pred: np.ndarray, gt: np.ndarray, data_range: float = 1.0) -> float:
    mse = float(np.mean((pred.astype(np.float64)
                         - gt.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range ** 2 / mse)


def _uniform_filter(img: np.ndarray, size: int) -> np.ndarray:
    """Valid-mode uniform filter via cumulative sums (2D, per channel)."""
    pad = size // 2
    out = img.astype(np.float64)
    for axis in (0, 1):
        c = np.cumsum(out, axis=axis)
        c = np.concatenate([np.zeros_like(np.take(c, [0], axis=axis)), c],
                           axis=axis)
        hi = np.take(c, range(size, c.shape[axis]), axis=axis)
        lo = np.take(c, range(0, c.shape[axis] - size), axis=axis)
        out = (hi - lo) / size
    del pad
    return out


def ssim(pred: np.ndarray, gt: np.ndarray, data_range: float = 1.0,
         win_size: int = 7, k1: float = 0.01, k2: float = 0.03) -> float:
    """skimage.structural_similarity semantics: uniform win, sample
    covariance (N/(N-1)), mean over the valid region, channels averaged.

    pred, gt: (h, w) or (h, w, c).
    """
    if pred.ndim == 3:
        return float(np.mean([
            ssim(pred[..., c], gt[..., c], data_range, win_size, k1, k2)
            for c in range(pred.shape[-1])]))
    x = pred.astype(np.float64)
    y = gt.astype(np.float64)
    np_ = win_size ** 2
    cov_norm = np_ / (np_ - 1)

    ux = _uniform_filter(x, win_size)
    uy = _uniform_filter(y, win_size)
    uxx = _uniform_filter(x * x, win_size)
    uyy = _uniform_filter(y * y, win_size)
    uxy = _uniform_filter(x * y, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux ** 2 + uy ** 2 + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    return float(s.mean())


class LPIPSVGG:
    """LPIPS(VGG16) perceptual distance (Zhang et al., CVPR'18).

    Needs pretrained VGG16 + linear-head weights from a local .npz
    (zero-egress: torchvision downloads are unavailable). Convert once with
    scripts/convert_lpips_weights.py on a machine with the weights, then
    pass the file here. Returns None from `maybe_create` when unavailable so
    evaluators can skip the metric gracefully.
    """

    _SLICES = ((0, 4), (4, 9), (9, 16), (16, 23), (23, 30))

    def __init__(self, weights_npz: str):
        data = np.load(weights_npz)
        self.conv_w = [data[f"conv{i}_w"] for i in range(13)]
        self.conv_b = [data[f"conv{i}_b"] for i in range(13)]
        self.lin_w = [data[f"lin{i}_w"] for i in range(5)]
        self.shift = data["shift"].reshape(1, 1, 1, 3)
        self.scale = data["scale"].reshape(1, 1, 1, 3)

    @classmethod
    def maybe_create(cls, weights_npz=None):
        import logging
        import os
        path = weights_npz or os.environ.get("BTS_LPIPS_WEIGHTS")
        if path and os.path.exists(path):
            return cls(path)
        logging.getLogger("bts_tpu.eval").warning(
            "LPIPS weights unavailable (%s) — reporting PSNR/SSIM only. "
            "Convert with scripts/convert_lpips_weights.py and pass "
            "lpips_weights or set BTS_LPIPS_WEIGHTS.",
            path or "no path given")
        return None

    def features(self, x, num_stages: int = 5):
        """VGG16 stage activations (relu1_2 .. relu5_3).

        x: (n, h, w, 3) in [-1, 1]. Returns list of NHWC feature arrays.
        """
        import jax
        import jax.numpy as jnp
        x = (x - self.shift) / self.scale
        feats = []
        ci = 0
        h = x
        # VGG16 conv structure: [2, 2, 3, 3, 3] convs per stage.
        for stage, n_convs in enumerate((2, 2, 3, 3, 3)[:num_stages]):
            for _ in range(n_convs):
                h = jax.lax.conv_general_dilated(
                    h, jnp.asarray(self.conv_w[ci]), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h = jax.nn.relu(h + jnp.asarray(self.conv_b[ci]))
                ci += 1
            feats.append(h)
            if stage < 4:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                    (1, 2, 2, 1), "VALID")
        return feats

    # Per-stage channel counts (VGG16 relu1_2..relu5_3).
    CHANNELS = (64, 128, 256, 512, 512)

    def __call__(self, pred: np.ndarray, gt: np.ndarray) -> float:
        """pred, gt: (h, w, 3) in [0, 1]."""
        import jax.numpy as jnp

        a = jnp.asarray(pred, dtype=jnp.float32)[None] * 2 - 1
        b = jnp.asarray(gt, dtype=jnp.float32)[None] * 2 - 1
        fa = self.features(a)
        fb = self.features(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            w = jnp.asarray(self.lin_w[i]).reshape(1, 1, 1, -1)
            total += float(jnp.mean(jnp.sum(d * w, axis=-1)))
        return total
