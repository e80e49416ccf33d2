"""Accuracy gate for the FAST training profile (exp_synthetic_flagship_fast).

The fast profile trains the flagship shape with 24 coarse + 16
importance-fine samples and `fine_reuse_coarse` — 40 queried field points
per ray instead of the reference's 64-flat budget (reference
configs/exp_kitti_raw.yaml:57-60, nerf.py:161-192) — and is the shipped
recommended training profile if it reaches flagship-class accuracy at
~1.4x the step throughput (PERF.md training table, round 4).

This gate pins that claim on the committed converged artifact
(media/weights/flagship_fast_conv.npz): depth metrics through the same
self-view eval path the flagship numbers use, at a reduced 96x320 eval
resolution so the CI cost stays bounded (bounds measured at exactly this
resolution with scripts/measure_gate_values.py fast).
"""
import os

import jax
import numpy as np
import pytest

ARTIFACT = os.path.join(os.path.dirname(__file__), "..", "media", "weights",
                        "flagship_fast_conv.npz")

# Measured with the committed checkpoint on this exact 3-scene 96x320
# subset (scripts/measure_gate_values.py fast — round 4). Bounds sit ~10%
# off the measured values.
ABS_REL_MAX = 0.24
A1_MIN = 0.60


def _model_conf():
    # Mirrors configs/exp_synthetic_flagship.yaml model_conf (the fast
    # profile changes only the renderer, not the model).
    return {
        "arch": "BTSNet", "z_near": 1.0, "z_far": 40.0, "inv_z": True,
        "learn_empty": False, "code_mode": "z",
        "code": {"num_freqs": 6, "freq_factor": 1.5, "include_input": True},
        "encoder": {"type": "monodepth2", "resnet_layers": 50,
                    "num_ch_dec": (32, 32, 64, 128, 256), "d_out": 64,
                    "scales": (0,)},
        "mlp_coarse": {"type": "resnet", "n_blocks": 0, "d_hidden": 64},
        "mlp_fine": {"type": "empty"},
    }


def evaluate_depth(n_scenes=3, image_size=(96, 320)):
    from behindthescenes_tpu import renderer as renderer_lib
    from behindthescenes_tpu.datasets.factory import make_datasets
    from behindthescenes_tpu.datasets.synthetic import collate
    from behindthescenes_tpu.evaluation.depth import DepthEvaluator
    from behindthescenes_tpu.models.bts import BTSNet
    from behindthescenes_tpu.utils.io import load_params_npz

    mc = _model_conf()
    variables = load_params_npz(ARTIFACT)
    net = BTSNet.from_conf(mc)
    rcfg = renderer_lib.RendererConfig(n_coarse=64, lindisp=True,
                                       hard_alpha_cap=True)
    ev = DepthEvaluator(net, rcfg, mc)
    assert ev.use_selfview                       # the eval_depth default
    _, test_ds = make_datasets({"type": "Synthetic",
                                "image_size": list(image_size),
                                "data_fc": 2, "length": 64})
    vals = {"abs_rel": [], "a1": []}
    for i in range(n_scenes):
        out = ev.evaluate(variables, collate([test_ds[i]]))
        for k in vals:
            vals[k].append(float(out[k]))
    return ({k: float(np.mean(v)) for k, v in vals.items()},
            {k: v for k, v in vals.items()})


@pytest.mark.skipif(not os.path.exists(ARTIFACT),
                    reason="converged fast-profile artifact not present")
def test_fast_profile_depth_gate():
    means, per_scene = evaluate_depth()
    assert means["abs_rel"] < ABS_REL_MAX, (means, per_scene)
    assert means["a1"] > A1_MIN, (means, per_scene)
