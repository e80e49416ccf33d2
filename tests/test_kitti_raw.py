"""KITTI-Raw loader test against a generated miniature dataset tree."""
import os

import cv2
import numpy as np
import pytest

from behindthescenes_tpu.datasets.kitti_raw import (KittiRawDataset,
                                                    project_velodyne_to_depth)

DAY = "2011_09_26"
SEQ = f"{DAY}_drive_0001_sync"
H0, W0 = 375, 1242  # base size for this day


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_raw")
    data = root / "data"
    poses = root / "poses"
    seq_dir = data / DAY / SEQ
    rng = np.random.default_rng(0)

    for cam in ("image_02", "image_03"):
        d = seq_dir / cam / "data"
        d.mkdir(parents=True)
        for i in range(6):
            img = rng.integers(0, 255, (H0, W0, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f"{i:010d}.jpg"), img)

    vd = seq_dir / "velodyne_points" / "data"
    vd.mkdir(parents=True)
    pts = np.concatenate([
        rng.uniform(3, 40, (500, 1)),            # x forward
        rng.uniform(-10, 10, (500, 1)),          # y left
        rng.uniform(-2, 1, (500, 1)),            # z up
        np.ones((500, 1))], axis=1).astype(np.float32)
    for i in range(6):
        pts.tofile(str(vd / f"{i:010d}.bin"))

    # Calibration: simple rectified stereo, fx=fy=700, baseline 0.54.
    k = np.array([[700.0, 0, W0 / 2], [0, 700.0, H0 / 2], [0, 0, 1]])
    p_l = np.hstack([k, np.zeros((3, 1))])
    p_r = p_l.copy()
    p_r[0, 3] = -0.54 * 700.0
    with open(data / DAY / "calib_cam_to_cam.txt", "w") as f:
        f.write("P_rect_02: " + " ".join(map(str, p_l.ravel())) + "\n")
        f.write("P_rect_03: " + " ".join(map(str, p_r.ravel())) + "\n")
        f.write("R_rect_00: " + " ".join(map(str, np.eye(3).ravel())) + "\n")
    with open(data / DAY / "calib_velo_to_cam.txt", "w") as f:
        # velodyne x-forward -> camera z-forward
        r = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], dtype=float)
        f.write("R: " + " ".join(map(str, r.ravel())) + "\n")
        f.write("T: 0 0 0\n")

    pd = poses / DAY
    pd.mkdir(parents=True)
    with open(pd / f"{SEQ}.txt", "w") as f:
        for i in range(6):
            pose = np.eye(4)
            pose[2, 3] = i * 0.8  # drive forward
            f.write(" ".join(map(str, pose[:3].ravel())) + "\n")

    split = root / "split"
    split.mkdir()
    for name in ("train_files.txt", "test_files.txt"):
        with open(split / name, "w") as f:
            f.write(f"{DAY}/{SEQ} 2 l\n")
            f.write(f"{DAY}/{SEQ} 3 r\n")
    return root


def test_kitti_raw_loading(kitti_tree):
    ds = KittiRawDataset(
        data_path=str(kitti_tree / "data"),
        pose_path=str(kitti_tree / "poses"),
        split_path=str(kitti_tree / "split" / "train_files.txt"),
        target_image_size=(96, 320), return_stereo=True, frame_count=2)
    assert len(ds) == 2
    item = ds[0]
    # 2 temporal frames x 2 stereo cameras.
    assert item["imgs"].shape == (4, 96, 320, 3)
    assert item["imgs"].min() >= -1 and item["imgs"].max() <= 1
    assert item["poses"].shape == (4, 4, 4)
    assert item["projs"].shape == (4, 3, 3)

    # NDC intrinsics: fx_ndc = 2*700/W0.
    np.testing.assert_allclose(item["projs"][0, 0, 0], 2 * 700 / W0,
                               atol=1e-5)
    np.testing.assert_allclose(item["projs"][0, 1, 1], 2 * 700 / H0,
                               atol=1e-5)

    # Stereo poses: right camera offset by +0.54 in x relative to left.
    t_gap = item["poses"][2][:3, 3] - item["poses"][0][:3, 3]
    np.testing.assert_allclose(t_gap, [0.54, 0, 0], atol=1e-5)

    # Keyframe first, temporal neighbor second (forward motion 0.8m).
    dz = item["poses"][1][2, 3] - item["poses"][0][2, 3]
    assert abs(abs(dz) - 0.8) < 1e-4


def test_kitti_raw_right_sample_order(kitti_tree):
    ds = KittiRawDataset(
        data_path=str(kitti_tree / "data"),
        pose_path=str(kitti_tree / "poses"),
        split_path=str(kitti_tree / "split" / "train_files.txt"),
        target_image_size=(48, 160), return_stereo=True, frame_count=2)
    item = ds[1]  # the 'r' datapoint: right camera images come first
    t_gap = item["poses"][2][:3, 3] - item["poses"][0][:3, 3]
    np.testing.assert_allclose(t_gap, [-0.54, 0, 0], atol=1e-5)


def test_kitti_raw_depth(kitti_tree):
    ds = KittiRawDataset(
        data_path=str(kitti_tree / "data"),
        pose_path=str(kitti_tree / "poses"),
        split_path=str(kitti_tree / "split" / "test_files.txt"),
        target_image_size=(96, 320), return_depth=True, frame_count=1)
    item = ds[0]
    depth = item["depths"]
    assert depth.shape == (1, 1, H0, W0)
    vals = depth[depth > 0]
    assert len(vals) > 50          # plenty of projected points
    assert vals.min() > 1e-3 and vals.max() < 80


def test_velodyne_projection_dupe_min():
    # Two points projecting to the same pixel keep the nearer depth.
    # P = [I|0]: pixel u = x/z. Both points land on pixel (1, 1)
    # (round(2.4)-1 = 1); the nearer depth must win.
    p_mat = np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)
    pts = np.array([
        [2.4, 2.4, 1.0, 1.0],
        [4.8, 4.8, 2.0, 1.0],
    ], dtype=np.float32)
    depth = project_velodyne_to_depth(pts, p_mat, (4, 4), eigen_depth=False)
    nz = depth[depth > 0]
    assert len(nz) == 1 and nz[0] == 1.0
