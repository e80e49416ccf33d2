"""Importance-sampling value gate on the thin-structure family.

The synthetic thin-structure scenes (street family + 0.25-0.5 m poles, a
fraction of one lindisp coarse z-bin at their depths) are the workload
where the importance-sampled fine pass (reference
models/common/render/nerf.py:161-208) does real work: flat coarse
sampling blurs the poles, the fine pass resolves them. This test loads
the committed CONVERGED thin-family checkpoint
(media/weights/thin_synth_conv.npz — exp_synthetic_thin @12k iters,
PERF.md round-3 thin-structure sweep) and gates two things:

1. VALUE: at an equal 16 queried-pts/ray budget, the 8-coarse +
   8-importance-fine profile (fine_reuse_coarse) beats 16-flat PSNR by
   a real margin on held-out thin scenes (measured +0.305). At budget
   32 the margin saturates (+0.02): the model was TRAINED at 32-flat,
   so its density field is exactly renderable at that rate — the fine
   pass's value shows at below-training serving budgets, which is its
   serving use case (PERF.md finding 14).
2. PARITY: fine_reuse_coarse produces the same image as the reference's
   re-query formulation (sort(concat(z_c, z_f)) re-queried) at this
   converged checkpoint, not just at random init (test_train_fine.py).
"""
import os

import numpy as np
import pytest

from behindthescenes_tpu.datasets.factory import make_datasets
from behindthescenes_tpu.datasets.synthetic import collate
from behindthescenes_tpu.utils.io import load_params_npz

ARTIFACT = os.path.join(os.path.dirname(__file__), "..", "media", "weights",
                        "thin_synth_conv.npz")

# Set from scripts/measure_gate_values.py on this exact 4-scene subset
# with the committed checkpoint (round-4 widening): 8+8 importance
# 20.988 vs 16-flat 20.778 PSNR (+0.210 margin; the round-3 2-scene
# subset measured +0.305). Gated at two-thirds of the measured margin so
# sampler noise can't flip it but a broken importance resampler (which
# would at best tie flat) fails.
PSNR_MARGIN_MIN = 0.14


def _model_conf():
    # Mirrors configs/exp_synthetic_thin.yaml model_conf.
    return {
        "arch": "BTSNet", "z_near": 1.0, "z_far": 40.0, "inv_z": True,
        "learn_empty": False, "code_mode": "z",
        "code": {"num_freqs": 6, "freq_factor": 1.5, "include_input": True},
        "encoder": {"type": "monodepth2", "resnet_layers": 18,
                    "num_ch_dec": (16, 16, 32, 32, 64), "d_out": 16,
                    "scales": (0,)},
        "mlp_coarse": {"type": "resnet", "n_blocks": 0, "d_hidden": 32},
        "mlp_fine": {"type": "empty"},
        "query_batch_size": 16384,
    }


def _dataset():
    _, test_ds = make_datasets({"type": "Synthetic",
                                "image_size": (96, 128), "data_fc": 2,
                                "thin_structures": 5, "length": 64})
    return test_ds


def _nvs_psnr(variables, n_coarse, n_fine, reuse, n_scenes=4):
    from behindthescenes_tpu import renderer as renderer_lib
    from behindthescenes_tpu.evaluation.nvs import NVSEvaluator
    from behindthescenes_tpu.models.bts import BTSNet

    mc = _model_conf()
    net = BTSNet.from_conf(mc)
    rcfg = renderer_lib.RendererConfig(
        n_coarse=n_coarse, n_fine=n_fine, fine_reuse_coarse=reuse,
        lindisp=True, hard_alpha_cap=True)
    ev = NVSEvaluator(net, rcfg, mc)
    ds = _dataset()
    return float(np.mean([float(ev.evaluate(variables,
                                            collate([ds[i]]))["psnr"])
                          for i in range(n_scenes)]))


@pytest.mark.skipif(not os.path.exists(ARTIFACT),
                    reason="converged thin artifact not present")
def test_fine_pass_beats_flat_at_equal_budget():
    variables = load_params_npz(ARTIFACT)
    psnr_flat = _nvs_psnr(variables, 16, 0, False)
    psnr_fine = _nvs_psnr(variables, 8, 8, True)
    assert psnr_fine - psnr_flat > PSNR_MARGIN_MIN, \
        f"importance fine no longer beats flat: {psnr_fine} vs {psnr_flat}"


@pytest.mark.skipif(not os.path.exists(ARTIFACT),
                    reason="converged thin artifact not present")
def test_fine_reuse_matches_requery_converged():
    variables = load_params_npz(ARTIFACT)
    psnr_reuse = _nvs_psnr(variables, 16, 16, True, n_scenes=1)
    psnr_requery = _nvs_psnr(variables, 16, 16, False, n_scenes=1)
    # Identical z-placement given identical coarse weights; the re-query
    # path re-evaluates the coarse z's (deterministic field -> same
    # values), so the composited images agree to float tolerance.
    # Measured: identical to 5e-8 PSNR at the committed checkpoint.
    assert abs(psnr_reuse - psnr_requery) < 0.05, (psnr_reuse, psnr_requery)
