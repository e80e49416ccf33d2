"""Color-jitter parity: the cv2/in-place implementation must match the
naive torchvision-float formulation (reference utils/augmentation.py:3-18)
to float rounding, draw the same rng stream, and never mutate its input."""
import cv2
import numpy as np

from behindthescenes_tpu.datasets.augmentation import sample_color_jitter


def _naive_jitter(rng, img):
    """The straightforward chained-numpy formulation (the pre-optimization
    implementation), used as the semantic oracle."""
    order = rng.permutation(4)
    b = rng.uniform(0.8, 1.2)
    c = rng.uniform(0.8, 1.2)
    s = rng.uniform(0.8, 1.2)
    h = rng.uniform(-0.1, 0.1)

    def brightness(x):
        return np.clip(x * b, 0.0, 1.0)

    def contrast(x):
        gray = (0.299 * x[..., 0] + 0.587 * x[..., 1]
                + 0.114 * x[..., 2]).mean()
        return np.clip((x - gray) * c + gray, 0.0, 1.0)

    def saturation(x):
        gray = (0.299 * x[..., 0] + 0.587 * x[..., 1]
                + 0.114 * x[..., 2])[..., None]
        return np.clip((x - gray) * s + gray, 0.0, 1.0)

    def hue(x):
        hsv = cv2.cvtColor(x.astype(np.float32), cv2.COLOR_RGB2HSV)
        hsv[..., 0] = (hsv[..., 0] + h * 360.0) % 360.0
        return np.clip(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB), 0.0, 1.0)

    fns = [brightness, contrast, saturation, hue]
    for i in order:
        img = fns[i](img)
    return img


def test_jitter_matches_naive_formulation():
    for seed in range(6):  # covers several op orders
        img = np.random.default_rng(100 + seed).random(
            (48, 64, 3)).astype(np.float32)
        fast = sample_color_jitter(np.random.default_rng(seed))(img)
        ref = _naive_jitter(np.random.default_rng(seed), img.copy())
        assert fast.dtype == np.float32
        # identical params (same rng stream) + float-rounding-level math
        np.testing.assert_allclose(fast, ref, atol=2e-5)


def test_jitter_does_not_mutate_input_and_stays_bounded():
    img = np.random.default_rng(0).random((32, 40, 3)).astype(np.float32)
    orig = img.copy()
    out = sample_color_jitter(np.random.default_rng(3))(img)
    np.testing.assert_array_equal(img, orig)
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert out is not img


def test_jitter_accepts_noncontiguous_and_f64_input():
    big = np.random.default_rng(1).random((32, 40, 6))
    view = big[:, :, ::2]  # non-contiguous float64 view
    out = sample_color_jitter(np.random.default_rng(4))(view)
    ref = sample_color_jitter(np.random.default_rng(4))(
        np.ascontiguousarray(view, dtype=np.float32))
    np.testing.assert_array_equal(out, ref)
