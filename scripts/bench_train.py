"""Training-step throughput at the flagship KITTI shape on the real chip.

Loops the compiled train step inside one jit (state carried through
lax.fori_loop, fixed view ids) and reports the marginal per-step time —
the same methodology as bench.py (PERF.md): fixed relay costs cancel.

Usage: python scripts/bench_train.py [micro_batch] [mode]
  mode: "kitti_raw" (default; 4 views, 2048 rays), "k360"
  (8-view stereo+fisheye samples, kitti360-mono split, 4096 rays —
  the exp_kitti_360 training shape), "re10k" (256x384, 3 views,
  1024 rays x 48 samples — the exp_re10k training shape), or
  "kitti_raw_fast" (24 coarse + 16 importance-fine with
  fine_reuse_coarse: 40 queried pts/ray instead of 64 — the
  PERF.md finding 14 sampling profile applied to TRAINING).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from behindthescenes_tpu.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from behindthescenes_tpu.datasets.synthetic import SyntheticBoxDataset, \
    collate
from behindthescenes_tpu.parallel.mesh import make_mesh
from behindthescenes_tpu.training.trainer import BTSTrainer

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
MODE = sys.argv[2] if len(sys.argv) > 2 else "kitti_raw"


def build_step(batch_size: int = 8, mode: str = "kitti_raw"):
    """Build the compiled train-step callable and its inputs for a bench
    mode. Returns (step, state, batch, key, ids, train_enc, config, desc).
    Shared by measure() below and scripts/roofline.py (which cost-analyzes
    the same step it times)."""
    valid_modes = {"kitti_raw", "kitti_raw_fast", "k360", "re10k",
                   "kitti_raw_tiles", "kitti_raw_tiles8"}
    if mode not in valid_modes:
        # The mode ifs below are non-exclusive fall-throughs: a typo'd mode
        # would silently benchmark the default shape under a bogus label.
        raise ValueError(f"unknown mode {mode!r}; expected one of "
                         f"{sorted(valid_modes)}")
    H, W = 192, 640
    config = {
        "seed": 0, "learning_rate": 1e-4, "bf16": True,
        "model_conf": {
            "arch": "BTSNet", "z_near": 3.0, "z_far": 80.0, "inv_z": True,
            "learn_empty": False, "code_mode": "z",
            "encoder": {"type": "monodepth2", "resnet_layers": 50,
                        "num_ch_dec": (32, 32, 64, 128, 256), "d_out": 64,
                        "scales": (0,)},
            "code": {"num_freqs": 6, "freq_factor": 1.5,
                     "include_input": True},
            "mlp_coarse": {"type": "resnet", "n_blocks": 0, "d_hidden": 64},
            "mlp_fine": {"type": "empty"},
            "n_frames_render": 2, "frame_sample_mode": "default",
            "sample_mode": "patch", "patch_size": 8,
            "ray_batch_size": 2048,
            "prediction_mode": "default", "flip_augmentation": False,
        },
        "loss": {"criterion": "l1+ssim", "invalid_policy": "weight_guided",
                 "lambda_edge_aware_smoothness": 0.001},
        "renderer": {"n_coarse": 64, "lindisp": True,
                     "hard_alpha_cap": True},
        "scheduler": {"type": "fix"},
    }
    n_views = 4
    if mode == "re10k":
        # exp_re10k training shape: mono video, 3 frames/sample, 256x384,
        # 1024 rays x 48 coarse samples.
        H, W = 256, 384
        n_views = 3
        config["model_conf"].update(ray_batch_size=1024)
        config["renderer"]["n_coarse"] = 48
    if mode == "kitti_raw_fast":
        # Finding 14's serving profile applied to training: the coarse
        # pass queries 24 pts/ray, the importance fine pass only the 16
        # NEW samples (cached coarse sigma/rgb re-used) -> 40 queried
        # pts/ray vs the reference's 64-flat, with loss on both passes
        # (reference fine-loss semantics, lambda_coarse=lambda_fine=1).
        config["renderer"].update(n_coarse=24, n_fine=16,
                                  fine_reuse_coarse=True)
    if mode == "kitti_raw_tiles":
        # Gather-free tile-region feature fetch (grid_sample_2d_tiles,
        # measured 6x the x-pair gathers at the fetch level): 16x64
        # regions cover this geometry's tile bboxes (p99 dx 35 / dy 4 px,
        # scripts/bench_strip_fetch.py) with 2x margin.
        config["model_conf"]["tile_fetch_region"] = [16, 64]
    if mode == "kitti_raw_tiles8":
        config["model_conf"]["tile_fetch_region"] = [8, 48]
    if mode == "k360":
        # exp_kitti_360 training shape: 8 views per sample (stereo pair +
        # 2 fisheye, x2 timesteps), kitti360-mono loss/render split,
        # 4096 rays.
        n_views = 8
        config["model_conf"].update(
            frame_sample_mode="kitti360-mono", ray_batch_size=4096)
    ds = SyntheticBoxDataset(length=batch_size, frame_count=n_views,
                             height=H, width=W, return_depth=False)
    batch = collate([ds[i] for i in range(batch_size)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    trainer = BTSTrainer(config, mesh=make_mesh(jax.devices()[:1]))
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(batch, key)

    ids = trainer.wrapper.select_views(np.random.default_rng(0), n_views,
                                       training=True)
    cfg = trainer.scheduler.step()
    step = trainer._build_train_step(cfg)
    train_enc = jnp.asarray(1.0)

    rays = config["model_conf"]["ray_batch_size"]
    smp = str(config["renderer"]["n_coarse"])
    if config["renderer"].get("n_fine"):
        smp += f"+{config['renderer']['n_fine']}f"
    desc = (f"{mode}, batch {batch_size}, {n_views} views {H}x{W}, "
            f"{rays} rays x {smp} smp, rn50 bf16")
    return step, state, batch, key, ids, train_enc, config, desc


def measure(batch_size: int = 8, mode: str = "kitti_raw"):
    """Marginal-timed train-step cost. Returns (ms_per_step,
    samples_per_sec, desc). Importable (bench.py reports the flagship
    shape as an extra metric)."""
    step, state, batch, key, ids, train_enc, config, desc = \
        build_step(batch_size, mode)

    def run_n(state, batch, key, n):
        def body(i, carry):
            st, k = carry
            k, sub = jax.random.split(k)
            st, _ = step(st, batch, sub, ids, train_enc)
            return (st, k)
        st, _ = jax.lax.fori_loop(0, n, body, (state, key))
        # Return a param-dependent scalar: returning st.step alone lets XLA
        # DCE the whole loop (it is just state.step + n).
        return jnp.sum(st.params["mlp_coarse"]["lin_in"]["kernel"])

    jf = jax.jit(run_n)
    lo, hi = jnp.int32(3), jnp.int32(13)
    float(jf(state, batch, key, lo))
    float(jf(state, batch, key, hi))

    def t(n):
        t0 = time.perf_counter()
        float(jf(state, batch, key, n))
        return time.perf_counter() - t0

    ts = [(t(lo), t(hi)) for _ in range(4)]
    ms = (np.median([b for _, b in ts]) - np.median([a for a, _ in ts])) \
        / (int(hi) - int(lo)) * 1e3
    return ms, batch_size / (ms / 1e3), desc


def main():
    ms, sps, desc = measure(BATCH, MODE)
    print(f"train step ({desc}): {ms:.1f} ms/step = {sps:.1f} samples/s")


if __name__ == "__main__":
    main()
