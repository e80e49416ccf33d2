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


def measure_re10k(n_scenes=2):
    from behindthescenes_tpu.utils.io import load_params_npz
    from tests.test_nvs_gate_re10k import _model_conf
    variables = load_params_npz(os.path.join(WEIGHTS, "re10k_synth_conv.npz"))
    psnr, ssim, psnrs, ssims = _eval_nvs(
        variables, _model_conf(),
        {"type": "Synthetic", "scene": "indoor", "image_size": (64, 96),
         "data_fc": 3, "length": 96}, 48, 0, False, n_scenes=n_scenes)
    print(f"re10k gate ({n_scenes} scenes): psnr={psnr:.3f} {psnrs} "
          f"ssim={ssim:.4f} {ssims}", flush=True)


def measure_thin(n_scenes=2):
    from behindthescenes_tpu.utils.io import load_params_npz
    from tests.test_fine_gate_thin import _model_conf
    variables = load_params_npz(os.path.join(WEIGHTS, "thin_synth_conv.npz"))
    dc = {"type": "Synthetic", "image_size": (96, 128), "data_fc": 2,
          "thin_structures": 5, "length": 64}
    mc = _model_conf()
    for (nc, nf, reuse) in [(32, 0, False), (16, 16, True), (16, 16, False),
                            (16, 0, False), (8, 8, True)]:
        psnr, ssim, psnrs, _ = _eval_nvs(variables, mc, dc, nc, nf, reuse,
                                         n_scenes=n_scenes)
        print(f"thin {nc:3d}+{nf:<3d} reuse={int(reuse)} ({n_scenes} sc): "
              f"psnr={psnr:.3f} {psnrs} ssim={ssim:.4f}", flush=True)


def measure_depth(n_scenes=8):
    """The tests/test_accuracy_gate.py depth subset, widened."""
    import jax
    import jax.numpy as jnp
    from behindthescenes_tpu.datasets.factory import make_datasets
    from behindthescenes_tpu.datasets.synthetic import collate
    from behindthescenes_tpu.parallel.mesh import make_mesh
    from behindthescenes_tpu.training.trainer import BTSTrainer, TrainState
    from behindthescenes_tpu.utils.io import load_params_npz
    from tests.test_accuracy_gate import _config

    variables = load_params_npz(
        os.path.join(WEIGHTS, "synthetic_conv_step8400.npz"))
    trainer = BTSTrainer(_config(False), mesh=make_mesh(jax.devices()[:1]))
    _, test_ds = make_datasets({"type": "Synthetic", "image_size": (48, 64),
                                "data_fc": 2, "length": 64})
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=None, step=jnp.asarray(8400))
    vals = {"abs_rel": [], "a1": []}
    for i in range(n_scenes):
        batch = {k: jnp.asarray(v) for k, v in collate([test_ds[i]]).items()}
        out = trainer.eval_step(state, batch)
        for k in vals:
            vals[k].append(float(out["metrics"][k]))
    print(f"depth gate ({n_scenes} scenes): "
          f"abs_rel={np.mean(vals['abs_rel']):.4f} {vals['abs_rel']} "
          f"a1={np.mean(vals['a1']):.4f} {vals['a1']}", flush=True)


def measure_synth_nvs(n_scenes=4):
    """The tests/test_accuracy_gate.py synthetic-NVS subset, widened."""
    from behindthescenes_tpu.utils.io import load_params_npz
    from tests.test_accuracy_gate import _config

    variables = load_params_npz(
        os.path.join(WEIGHTS, "synthetic_conv_step8400.npz"))
    cfg = _config()
    psnr, ssim, psnrs, ssims = _eval_nvs(
        variables, cfg["model_conf"],
        {"type": "Synthetic", "image_size": (48, 64), "data_fc": 2,
         "length": 64}, 24, 0, False, n_scenes=n_scenes)
    print(f"synth nvs gate ({n_scenes} scenes): psnr={psnr:.3f} {psnrs} "
          f"ssim={ssim:.4f} {ssims}", flush=True)


def measure_occ(n_keyframes=4):
    """The tests/test_occupancy_gate.py subsets, widened: regenerates the
    held-out drive with enough frames for n_keyframes eval keyframes (the
    20-timestep LiDAR window trails each), then runs both evaluators."""
    import subprocess
    import jax.numpy as jnp  # noqa: F401  (platform init order)
    from behindthescenes_tpu import renderer as rlib
    from behindthescenes_tpu.datasets.synthetic import collate
    from behindthescenes_tpu.evaluation.bbox_occ import BBoxOccEvaluator
    from behindthescenes_tpu.evaluation.lidar_occ import LidarOccEvaluator
    import tests.test_occupancy_gate as tog

    keyframes = [2 + 3 * i for i in range(n_keyframes)]
    tree = f"/tmp/bts_gate_k360_w{n_keyframes}"
    marker = os.path.join(tree, ".complete")
    n_frames = keyframes[-1] + 20 + 3
    if not os.path.exists(marker):
        gen = os.path.join(REPO, "scripts", "datasets",
                           "gen_synthetic_kitti_360.py")
        pre = os.path.join(REPO, "scripts", "datasets",
                           "preprocess_kitti_360.py")
        subprocess.run(
            [sys.executable, gen, "--out", tree, "--seq", "drive_0001_sync",
             "--seed", "1", "--splits", "none", "--frames", str(n_frames),
             "--scale", "0.5"], check=True, timeout=2400)
        subprocess.run([sys.executable, pre, "-d", tree], check=True,
                       timeout=600)
        os.makedirs(os.path.join(tree, "splits"), exist_ok=True)
        with open(os.path.join(tree, "splits", "test_files.txt"), "w") as f:
            f.writelines(f"drive_0001_sync {k} l\n" for k in keyframes)
        open(marker, "w").write("ok")

    net, mc, variables = tog._net_and_variables()
    cfg = rlib.RendererConfig(n_coarse=64, lindisp=True, hard_alpha_cap=True)

    ds = tog._dataset.__wrapped__(tree) if hasattr(tog._dataset, "__wrapped__") \
        else tog._dataset(tree)
    ev = LidarOccEvaluator(net, cfg, mc, ds)
    vals = {}
    for i in range(n_keyframes):
        out = ev.evaluate(variables, collate([ds[i]]))
        for k, v in out.items():
            vals.setdefault(k, []).append(float(v))
    print(f"lidar occ gate ({n_keyframes} kf): "
          + " ".join(f"{k}={np.mean(v):.4f} {np.round(v, 3).tolist()}"
                     for k, v in sorted(vals.items())), flush=True)

    ds2 = tog._dataset(tree, return_3d_bboxes=True, return_segmentation=True)
    ev2 = BBoxOccEvaluator(net, cfg, mc, ds2)
    vals2 = {}
    for i in range(min(2, n_keyframes)):
        out = ev2.evaluate(variables, collate([ds2[i]]))
        for k, v in out.items():
            vals2.setdefault(k, []).append(float(v))
    print(f"bbox occ gate ({min(2, n_keyframes)} frames): "
          + " ".join(f"{k}={np.mean(v):.4f} {np.round(v, 3).tolist()}"
                     for k, v in sorted(vals2.items())), flush=True)


def measure_fast(n_scenes=4):
    """The tests/test_train_fast_gate.py subset — runs the test's own
    evaluation so the measured values match the gate exactly."""
    from tests.test_train_fast_gate import evaluate_depth
    means, per_scene = evaluate_depth(n_scenes=n_scenes)
    print(f"fast-profile gate ({n_scenes} scenes, 192x640): "
          f"abs_rel={means['abs_rel']:.4f} {per_scene['abs_rel']} "
          f"a1={means['a1']:.4f} {per_scene['a1']}", flush=True)


def measure_fast_nvs(n_scenes=4, image_size=(96, 320)):
    """The tests/test_train_fast_gate.py NVS-serving subset: the fast
    artifact evaluated at the SHIPPED eval_synthetic_flagship_nvs profile
    (24 coarse + 16 fine, fine_reuse_coarse — the repo's best NVS
    configuration, PERF.md) at reduced resolution so CI runs it."""
    from behindthescenes_tpu.utils.io import load_params_npz
    from tests.test_train_fast_gate import _model_conf
    variables = load_params_npz(
        os.path.join(WEIGHTS, "flagship_fast_conv.npz"))
    psnr, ssim, psnrs, ssims = _eval_nvs(
        variables, _model_conf(),
        {"type": "Synthetic", "image_size": list(image_size), "data_fc": 2,
         "length": 64}, 24, 16, True, n_scenes=n_scenes)
    print(f"fast-profile NVS gate ({n_scenes} scenes, {image_size}): "
          f"psnr={psnr:.3f} {psnrs} ssim={ssim:.4f} {ssims}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    if which == "fast":
        measure_fast(n or 3)
    if which == "fast_nvs":
        measure_fast_nvs(n or 4)
    if which in ("re10k", "all"):
        measure_re10k(n or 2)
    if which in ("thin", "all"):
        measure_thin(n or 2)
    if which in ("depth", "all"):
        measure_depth(n or 8)
    if which in ("synth_nvs", "all"):
        measure_synth_nvs(n or 4)
    if which in ("occ", "all"):
        measure_occ(n or 4)
