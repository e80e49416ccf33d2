"""Measure the REFERENCE training step on this host's CPU (torch, live).

Runs the actual reference modules (/root/reference via
tests/reference_oracle.py — BTSNet, NeRFRenderer, PatchRaySampler,
ReconstructionLoss) through one real training step at the flagship
KITTI-Raw shape (reference configs/exp_kitti_raw.yaml:10-76): 192x640,
4-frame samples, encode view 0, 2 render views, 2048 rays (8x8 patches)
x 64 coarse samples, l1+ssim weight_guided loss + edge-aware smoothness,
loss.backward(), Adam step — the same step structure
scripts/bench_train.py times on the TPU (reference
models/bts/trainer.py:88-276 + utils/base_trainer.py:270-307).

This sets the `train_vs_baseline` denominator in bench.py: the reference
repo publishes no training throughput numbers and its A40/A100 hardware
does not exist here, so the honest anchor is (a) this live CPU measurement
of the reference's own code and (b) the counted-op A40/A100 roofline
estimate in BASELINE.md, cross-checked against (a) exactly like the render
headline's estimate.

Usage: python scripts/bench_torch_train_baseline.py [batch] [n_steps]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

H, W = 192, 640
N_VIEWS = 4
RAYS = 2048
PATCH = 8
K = 64
Z_NEAR, Z_FAR = 3.0, 80.0


def main(batch: int = 1, n_steps: int = 3):
    import torch
    from reference_oracle import (FLAGSHIP_LOSS_CONF, FLAGSHIP_MODEL_CONF,
                                  load_reference)
    ref = load_reference()
    torch.manual_seed(0)
    tnet = ref.bts.BTSNet(FLAGSHIP_MODEL_CONF)
    tnet.train()
    renderer = ref.nerf.NeRFRenderer(
        n_coarse=K, n_fine=0, n_fine_depth=0, depth_std=1.0,
        white_bkgd=False, lindisp=True, hard_alpha_cap=True)
    renderer.train()
    wrapped = renderer.bind_parallel(tnet).eval()
    wrapped.train()
    sampler = ref.ray_sampler.PatchRaySampler(RAYS, Z_NEAR, Z_FAR, PATCH)
    criterion = ref.loss.ReconstructionLoss(FLAGSHIP_LOSS_CONF)
    opt = torch.optim.Adam(tnet.parameters(), lr=1e-4)

    rng = np.random.default_rng(0)
    images = torch.from_numpy(
        rng.uniform(-1, 1, (batch, N_VIEWS, 3, H, W)).astype(np.float32))
    poses = np.tile(np.eye(4, dtype=np.float32), (batch, N_VIEWS, 1, 1))
    for i in range(N_VIEWS):
        poses[:, i, 0, 3] = 0.54 * i
        poses[:, i, 2, 3] = -0.1 * i
    poses = torch.from_numpy(poses)
    ks = torch.from_numpy(np.tile(np.array(
        [[1.7, 0.0, 0.0], [0.0, 0.58, 0.0], [0.0, 0.0, 1.0]],
        dtype=np.float32), (batch, N_VIEWS, 1, 1)))

    ids_encoder = [0]
    ids_render = [0, 1]
    ids_loss = [2, 3]

    def step():
        opt.zero_grad(set_to_none=True)
        tnet.encode(images, ks, poses, ids_encoder=ids_encoder,
                    ids_render=ids_render)
        imgs01 = images * 0.5 + 0.5
        rays, rgb_gt = sampler.sample(imgs01[:, ids_loss],
                                      poses[:, ids_loss], ks[:, ids_loss])
        out = wrapped(rays.reshape(batch, -1, 8), want_weights=True,
                      want_alphas=True, want_rgb_samps=True)
        if "fine" not in out:
            # n_fine=0: the loss consumes the coarse pass as the fine one
            # (the reference trainer's mlp_fine=empty arrangement).
            out["fine"] = dict(out["coarse"])
        out["rgb_gt"] = rgb_gt
        out = sampler.reconstruct(out)
        data = {"coarse": [out["coarse"]], "fine": [out["fine"]],
                "rgb_gt": out["rgb_gt"]}
        loss, _ = criterion(data)
        loss.backward()
        opt.step()
        return float(loss.detach())

    step()                                   # warmup (allocator, autograd)
    times = []
    for _ in range(n_steps):
        t0 = time.perf_counter()
        step()
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    print(f"torch CPU reference train step (batch {batch}, {N_VIEWS} views "
          f"{H}x{W}, {RAYS} rays x {K} smp, rn50): {t:.2f}s/step, "
          f"{batch / t:.3f} samples/s")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    main(b, n)
