"""LPIPS-VGG and the perceptual image processor with synthetic weights
(real weights need network access; shapes/flow are what we pin here)."""
import numpy as np
import pytest

VGG_CFG = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
           (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
           (512, 512), (512, 512), (512, 512)]
LIN_CH = [64, 128, 256, 512, 512]


@pytest.fixture(scope="module")
def fake_lpips_npz(tmp_path_factory):
    rng = np.random.default_rng(0)
    out = {}
    for i, (cin, cout) in enumerate(VGG_CFG):
        out[f"conv{i}_w"] = rng.standard_normal(
            (3, 3, cin, cout)).astype(np.float32) * 0.05
        out[f"conv{i}_b"] = np.zeros(cout, dtype=np.float32)
    for i, c in enumerate(LIN_CH):
        out[f"lin{i}_w"] = np.abs(rng.standard_normal(c)).astype(np.float32)
    out["shift"] = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
    out["scale"] = np.array([0.458, 0.448, 0.450], dtype=np.float32)
    path = tmp_path_factory.mktemp("lpips") / "fake_lpips.npz"
    np.savez(path, **out)
    return str(path)


def test_lpips_metric_properties(fake_lpips_npz):
    from behindthescenes_tpu.evaluation.metrics import LPIPSVGG
    lp = LPIPSVGG(fake_lpips_npz)
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1).astype(np.float32)
    assert lp(a, a) < 1e-9
    assert lp(a, b) > 0


def test_perceptual_processor(fake_lpips_npz):
    import jax.numpy as jnp
    from behindthescenes_tpu.models.image_processor import (
        PerceptualProcessor, make_image_processor)
    proc = make_image_processor({"type": "perceptual", "layers": 2,
                                 "weights": fake_lpips_npz})
    assert isinstance(proc, PerceptualProcessor)
    assert proc.channels == 64 + 128
    imgs = jnp.zeros((1, 2, 16, 24, 3))
    out = proc(imgs)
    assert out.shape == (1, 2, 16, 24, 192)
    assert np.isfinite(np.asarray(out)).all()


def test_perceptual_without_weights_raises(monkeypatch):
    monkeypatch.delenv("BTS_LPIPS_WEIGHTS", raising=False)
    from behindthescenes_tpu.models.image_processor import \
        make_image_processor
    with pytest.raises(NotImplementedError):
        make_image_processor({"type": "perceptual"})
