"""Measure the accuracy-gate values for the round-3 artifact tests.

Runs the EXACT evaluations that tests/test_nvs_gate_re10k.py and
tests/test_fine_gate_thin.py perform, printing the measured values so the
gate bounds can be set ~10% off measurement (the same procedure used for
tests/test_accuracy_gate.py and tests/test_occupancy_gate.py). Run on CPU:

  JAX_PLATFORMS=cpu JAX_COMPILATION_CACHE_DIR=/tmp/jax_test_cache \
      python scripts/measure_gate_values.py [re10k|thin|all]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from behindthescenes_tpu.platform import apply_platform_env

apply_platform_env()

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS = os.path.join(REPO, "media", "weights")


def _eval_nvs(variables, model_conf, data_conf, n_coarse, n_fine, reuse,
              n_scenes=2):
    from behindthescenes_tpu import renderer as renderer_lib
    from behindthescenes_tpu.datasets.factory import make_datasets
    from behindthescenes_tpu.datasets.synthetic import collate
    from behindthescenes_tpu.evaluation.nvs import NVSEvaluator
    from behindthescenes_tpu.models.bts import BTSNet

    net = BTSNet.from_conf(model_conf)
    rcfg = renderer_lib.RendererConfig(
        n_coarse=n_coarse, n_fine=n_fine, fine_reuse_coarse=reuse,
        lindisp=True, hard_alpha_cap=True)
    ev = NVSEvaluator(net, rcfg, model_conf)
    _, test_ds = make_datasets(data_conf)
    psnrs, ssims = [], []
    for i in range(n_scenes):
        out = ev.evaluate(variables, collate([test_ds[i]]))
        psnrs.append(float(out["psnr"]))
        ssims.append(float(out["ssim"]))
    return float(np.mean(psnrs)), float(np.mean(ssims)), psnrs, ssims


def measure_re10k():
    from behindthescenes_tpu.utils.io import load_params_npz
    from tests.test_nvs_gate_re10k import _model_conf
    variables = load_params_npz(os.path.join(WEIGHTS, "re10k_synth_conv.npz"))
    psnr, ssim, psnrs, ssims = _eval_nvs(
        variables, _model_conf(),
        {"type": "Synthetic", "scene": "indoor", "image_size": (64, 96),
         "data_fc": 3, "length": 96}, 48, 0, False)
    print(f"re10k gate: psnr={psnr:.3f} {psnrs} ssim={ssim:.4f} {ssims}")


def measure_thin():
    from behindthescenes_tpu.utils.io import load_params_npz
    from tests.test_fine_gate_thin import _model_conf
    variables = load_params_npz(os.path.join(WEIGHTS, "thin_synth_conv.npz"))
    dc = {"type": "Synthetic", "image_size": (96, 128), "data_fc": 2,
          "thin_structures": 5, "length": 64}
    mc = _model_conf()
    for (nc, nf, reuse) in [(32, 0, False), (16, 16, True), (16, 16, False),
                            (16, 0, False), (8, 8, True)]:
        psnr, ssim, psnrs, _ = _eval_nvs(variables, mc, dc, nc, nf, reuse)
        print(f"thin {nc:3d}+{nf:<3d} reuse={int(reuse)}: "
              f"psnr={psnr:.3f} {psnrs} ssim={ssim:.4f}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("re10k", "all"):
        measure_re10k()
    if which in ("thin", "all"):
        measure_thin()
