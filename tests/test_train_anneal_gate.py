"""Accuracy gate for the fast→flat ANNEALED training artifact.

Recipe (PERF.md round 5, scripts/train_fastanneal.sh): 15k iterations at
the fast sampling profile (24+16 `fine_reuse_coarse`) then flat 64-coarse
fine-tuning. Flat fine-tuning recovers ~60% of the fast profile's depth
gap (official 8-scene CLI: 0.217 → 0.183 at the 17k peak; the committed
20k checkpoint measures 0.193) while the model becomes the repo's BEST
NVS artifact (21.77 PSNR / 0.859 SSIM at the shipped 24+16 serving
profile, official CLI — above both the fast and 64-flat flagship
models). This gate pins the committed artifact
(media/weights/fastanneal_conv.npz) at its own measured level on
deterministic CPU-runnable subsets.
"""
import os

import numpy as np
import pytest

from test_train_fast_gate import _model_conf

ARTIFACT = os.path.join(os.path.dirname(__file__), "..", "media", "weights",
                        "fastanneal_conv.npz")

# Measured with the committed checkpoint (scripts in git history, CPU):
# depth 4-scene 192x640 subset: abs_rel 0.1933 (0.217/0.176/0.203/0.178),
# a1 0.6022; NVS 4-scene 96x320 at the shipped 24+16 reuse profile:
# PSNR 19.873 / SSIM 0.7752 (above the fast artifact's 19.699/0.768 on
# the same subset). Bounds ~10% off measurement.
ABS_REL_MAX = 0.213
A1_MIN = 0.54
NVS_PSNR_MIN = 17.9
NVS_SSIM_MIN = 0.70


@pytest.mark.skipif(not os.path.exists(ARTIFACT),
                    reason="annealed artifact not present")
def test_anneal_depth_gate():
    import jax.numpy as jnp  # noqa: F401 (platform init via conftest)
    from behindthescenes_tpu import renderer as rlib
    from behindthescenes_tpu.datasets.factory import make_datasets
    from behindthescenes_tpu.datasets.synthetic import collate
    from behindthescenes_tpu.evaluation.depth import DepthEvaluator
    from behindthescenes_tpu.models.bts import BTSNet
    from behindthescenes_tpu.utils.io import load_params_npz

    mc = _model_conf()
    variables = load_params_npz(ARTIFACT)
    ev = DepthEvaluator(BTSNet.from_conf(mc), rlib.RendererConfig(
        n_coarse=64, lindisp=True, hard_alpha_cap=True), mc)
    _, ds = make_datasets({"type": "Synthetic", "image_size": (192, 640),
                           "data_fc": 2, "length": 64})
    vals = {"abs_rel": [], "a1": []}
    for i in range(4):
        out = ev.evaluate(variables, collate([ds[i]]))
        for k in vals:
            vals[k].append(float(out[k]))
    assert np.mean(vals["abs_rel"]) < ABS_REL_MAX, vals
    assert np.mean(vals["a1"]) > A1_MIN, vals


@pytest.mark.skipif(not os.path.exists(ARTIFACT),
                    reason="annealed artifact not present")
def test_anneal_nvs_gate():
    from behindthescenes_tpu import renderer as rlib
    from behindthescenes_tpu.datasets.factory import make_datasets
    from behindthescenes_tpu.datasets.synthetic import collate
    from behindthescenes_tpu.evaluation.nvs import NVSEvaluator
    from behindthescenes_tpu.models.bts import BTSNet
    from behindthescenes_tpu.utils.io import load_params_npz

    mc = _model_conf()
    variables = load_params_npz(ARTIFACT)
    ev = NVSEvaluator(BTSNet.from_conf(mc), rlib.RendererConfig(
        n_coarse=24, n_fine=16, fine_reuse_coarse=True, lindisp=True,
        hard_alpha_cap=True), mc)
    _, ds = make_datasets({"type": "Synthetic", "image_size": (96, 320),
                           "data_fc": 2, "length": 64})
    ps, ss = [], []
    for i in range(4):
        o = ev.evaluate(variables, collate([ds[i]]))
        ps.append(o["psnr"])
        ss.append(o["ssim"])
    assert np.mean(ps) > NVS_PSNR_MIN, ps
    assert np.mean(ss) > NVS_SSIM_MIN, ss
