"""NVS accuracy gate at the RE10K workload shape.

Evaluates the committed CONVERGED synthetic-indoor checkpoint
(media/weights/re10k_synth_conv.npz — exp_synthetic_re10k trained on the
synthetic indoor family, see PERF.md round-3) with the NVS evaluator:
encode frame 0 of a mono forward-dolly clip, render the other frames,
PSNR/SSIM with the reference's 5% border crop
(reference models/bts/evaluator_nvs.py:141-178 — the RealEstate10K
benchmark semantics). A regression in cross-view rendering at the RE10K
configuration — code_mode=distance, inv_z over [1, 100], 48 coarse
samples — now fails CI as an accuracy cliff, mirroring what
tests/test_accuracy_gate.py does for the flagship depth/NVS path.

The gate evaluates at a reduced 64x96 resolution (the encoder is
convolutional; the indoor scenes re-render at any size) so the test runs
in seconds on CPU; the bounds below were measured at this exact
resolution/subset with the committed weights.
"""
import os

import numpy as np
import pytest

from behindthescenes_tpu.datasets.factory import make_datasets
from behindthescenes_tpu.datasets.synthetic import collate
from behindthescenes_tpu.utils.io import load_params_npz

ARTIFACT = os.path.join(os.path.dirname(__file__), "..", "media", "weights",
                        "re10k_synth_conv.npz")

# Set from scripts/measure_gate_values.py on this exact 4-scene 64x96
# subset with the committed checkpoint (round-4 widening; per-scene PSNR
# 29.77/30.44/31.10/29.64): measured PSNR 30.24 / SSIM 0.9202. Gates sit
# ~10% off measurement so a 10% semantic regression fails, not just a
# cliff, and the 4-scene mean is robust to a single-scene shift.
PSNR_MIN = 27.2
SSIM_MIN = 0.87


def _model_conf():
    # Mirrors configs/exp_synthetic_re10k.yaml model_conf.
    return {
        "arch": "BTSNet", "z_near": 1.0, "z_far": 100.0, "inv_z": True,
        "learn_empty": False, "code_mode": "distance",
        "code": {"num_freqs": 6, "freq_factor": 1.5, "include_input": True},
        "encoder": {"type": "monodepth2", "resnet_layers": 50,
                    "num_ch_dec": (32, 32, 64, 128, 256), "d_out": 32,
                    "scales": (0,)},
        "mlp_coarse": {"type": "resnet", "n_blocks": 1, "d_hidden": 32},
        "mlp_fine": {"type": "empty"},
        "query_batch_size": 16384,
    }


@pytest.mark.skipif(not os.path.exists(ARTIFACT),
                    reason="converged re10k artifact not present")
def test_re10k_nvs_gate():
    from behindthescenes_tpu import renderer as renderer_lib
    from behindthescenes_tpu.evaluation.nvs import NVSEvaluator
    from behindthescenes_tpu.models.bts import BTSNet

    mc = _model_conf()
    variables = load_params_npz(ARTIFACT)
    net = BTSNet.from_conf(mc)
    rcfg = renderer_lib.RendererConfig(n_coarse=48, lindisp=True,
                                       hard_alpha_cap=True)
    ev = NVSEvaluator(net, rcfg, mc)

    _, test_ds = make_datasets({"type": "Synthetic", "scene": "indoor",
                                "image_size": (64, 96), "data_fc": 3,
                                "length": 96})
    psnrs, ssims = [], []
    for i in range(4):
        out = ev.evaluate(variables, collate([test_ds[i]]))
        psnrs.append(float(out["psnr"]))
        ssims.append(float(out["ssim"]))
    assert np.mean(psnrs) > PSNR_MIN, f"RE10K NVS psnr regressed: {psnrs}"
    assert np.mean(ssims) > SSIM_MIN, f"RE10K NVS ssim regressed: {ssims}"
