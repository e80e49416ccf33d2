"""KITTI-360 loader tests against a generated miniature tree + fisheye
resampler parity vs a torch grid_sample oracle."""
import os

import cv2
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from behindthescenes_tpu.datasets.kitti_360 import (FisheyeToPinholeSampler,
                                                    Kitti360Dataset)

SEQ = "2013_05_28_drive_0000_sync"
HP, WP = 376, 1408    # perspective rect size
HF, WF = 700, 700     # fisheye size

FISH_CALIB = {
    "mirror_parameters": {"xi": 2.2},
    "distortion_parameters": {"k1": 0.02, "k2": -0.005},
    "projection_parameters": {"gamma1": 1.4, "gamma2": 1.5,
                              "u0": 0.01, "v0": -0.02},
    "image_height": HF, "image_width": WF,
}


def test_fisheye_resampler_matches_torch_oracle():
    k_target = np.array([[1.2, 0, 0.0], [0, 1.6, 0.0], [0, 0, 1.0]])
    rot = np.eye(3)
    target = (24, 40)
    sampler = FisheyeToPinholeSampler(k_target, target, dict(FISH_CALIB),
                                      rot)

    # Oracle: reference math with torch (kitti_360_dataset.py:25-68).
    h, w = target
    x = torch.linspace(-1, 1, w).view(1, -1).expand(target)
    y = torch.linspace(-1, 1, h).view(-1, 1).expand(target)
    z = torch.ones_like(x)
    xyz = torch.stack((x, y, z), dim=-1).view(-1, 3).double()
    xyz = (torch.inverse(torch.tensor(k_target)) @ xyz.T).T
    xyz = xyz / torch.norm(xyz, dim=-1, keepdim=True)
    xs_, ys_, zs_ = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    xi = FISH_CALIB["mirror_parameters"]["xi"]
    xs_ = xs_ / (zs_ + xi)
    ys_ = ys_ / (zs_ + xi)
    k1 = FISH_CALIB["distortion_parameters"]["k1"]
    k2 = FISH_CALIB["distortion_parameters"]["k2"]
    r = xs_ * xs_ + ys_ * ys_
    factor = 1 + k1 * r + k2 * r * r
    xs_, ys_ = xs_ * factor, ys_ * factor
    pp = FISH_CALIB["projection_parameters"]
    xs_ = xs_ * pp["gamma1"] + pp["u0"]
    ys_ = ys_ * pp["gamma2"] + pp["v0"]
    grid = torch.stack((xs_, ys_), dim=-1).view(1, h, w, 2).float()

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (HF, WF, 3)).astype(np.float32)
    t_img = torch.from_numpy(img).permute(2, 0, 1)[None]
    oracle = F.grid_sample(t_img, grid, align_corners=True,
                           mode="bilinear")[0].permute(1, 2, 0).numpy()

    ours = sampler.resample(img)
    np.testing.assert_allclose(ours, oracle, atol=2e-3)


@pytest.fixture(scope="module")
def kitti360_tree(tmp_path_factory):
    from kitti360_fixture import build_kitti360_tree
    root = tmp_path_factory.mktemp("kitti360")
    return build_kitti360_tree(root)


def test_kitti360_loading(kitti360_tree):
    ds = Kitti360Dataset(
        data_path=str(kitti360_tree / "data"),
        pose_path=str(kitti360_tree / "poses"),
        split_path=str(kitti360_tree / "split" / "test_files.txt"),
        target_image_size=(48, 176), return_stereo=True,
        return_fisheye=True, return_depth=True, frame_count=2)
    assert len(ds) == 1
    item = ds[0]
    # 2 persp left + 2 persp right + 2 fish left + 2 fish right
    assert item["imgs"].shape == (8, 48, 176, 3)
    assert item["poses"].shape == (8, 4, 4)
    assert item["projs"].shape == (8, 3, 3)
    assert item["depths"].shape == (1, 1, 48, 176)
    assert (item["depths"] > 0).sum() > 20
    # NDC intrinsics
    np.testing.assert_allclose(item["projs"][0, 0, 0], 2 * 600 / WP,
                               atol=1e-5)
    # Stereo separation between perspective cams.
    gap = item["poses"][2, :3, 3] - item["poses"][0, :3, 3]
    np.testing.assert_allclose(gap, [0.6, 0, 0], atol=1e-5)
    assert np.isfinite(item["imgs"]).all()


def test_kitti360_full_split_integrity(kitti360_tree):
    ds = Kitti360Dataset(
        data_path=str(kitti360_tree / "data"),
        pose_path=str(kitti360_tree / "poses"),
        split_path=None,
        target_image_size=(48, 176), return_fisheye=True, frame_count=2)
    # 5 frames x (left + right)
    assert len(ds) == 10
