"""Miniature-tree tests for the secondary dataset loaders
(Waymo, VIPER, TRI-PD, NYUv2, KITTI Odometry) — the primary loaders
(KITTI-Raw/360, RE10K) have their own test modules. Each test generates a
tiny on-disk tree in the loader's expected layout and checks shapes,
value ranges, and one analytic property per loader (reference
datasets/*/..._dataset.py).
"""
import json
import os
import pickle

import cv2
import numpy as np
import pytest


# ---------------------------------------------------------------- Waymo

def _make_waymo_tree(root, n_frames=20, h=32, w=48):
    seq = "seg-0001"
    base = os.path.join(root, "training", seq)
    poses = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    poses[:, 0, 3] = np.arange(n_frames)  # x-translation = frame id
    os.makedirs(os.path.join(base, "lidar"))
    np.save(os.path.join(base, "poses.npy"), poses)

    ident = np.eye(4, dtype=np.float64)
    k_ndc = np.eye(3, dtype=np.float64)
    calib = {"extrinsics": {c: ident for c in (1, 2, 3, 4, 5)},
             "proj_mats": {c: k_ndc for c in (1, 2, 3, 4, 5)}}
    with open(os.path.join(base, "calibration.pkl"), "wb") as f:
        pickle.dump(calib, f)
    with open(os.path.join(base, "exposures.pkl"), "wb") as f:
        pickle.dump({c: np.ones(n_frames) for c in (1, 2, 3, 4, 5)}, f)

    rng = np.random.default_rng(0)
    for c in (1, 2, 3, 4, 5):
        d = os.path.join(base, "frames", f"cam_{c:02d}")
        os.makedirs(d)
        for i in range(n_frames):
            cv2.imwrite(os.path.join(d, f"{i:010d}.jpg"),
                        rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    # One lidar point straight ahead at depth 5 (NDC center pixel).
    np.save(os.path.join(base, "lidar", f"{5:010d}.npy"),
            np.array([[0.0, 0.0, 5.0]], dtype=np.float32))
    return seq


def test_waymo_dataset(tmp_path):
    from behindthescenes_tpu.datasets.waymo import WaymoDataset
    _make_waymo_tree(str(tmp_path))
    ds = WaymoDataset(str(tmp_path), "training", target_image_size=(32, 48),
                      frame_count=2, return_depth=True,
                      correct_exposure=True)
    assert len(ds) == 20
    item = ds[5]
    # keyframe 5: cam1 frames [5,6], 45deg cams [10,11]x2, 90deg [15,16]x2.
    assert item["imgs"].shape == (10, 32, 48, 3)
    assert item["projs"].shape == (10, 3, 3)
    assert item["poses"].shape == (10, 4, 4)
    assert item["imgs"].min() >= -1.0 and item["imgs"].max() <= 1.0
    # pose = ego_pose @ extrinsic(=I): x-translation equals the frame id.
    np.testing.assert_allclose(item["poses"][:2, 0, 3], [5.0, 6.0])
    np.testing.assert_allclose(item["poses"][2:4, 0, 3], [10.0, 11.0])
    np.testing.assert_allclose(item["poses"][6:8, 0, 3], [15.0, 16.0])
    # lidar point (0,0,5) projects to the center pixel with depth 5.
    depth = item["depths"]
    assert depth.shape == (1, 1, 32, 48)
    assert depth[0, 0, 16, 24] == pytest.approx(5.0)
    assert (depth > 0).sum() == 1


# ---------------------------------------------------------------- VIPER

def _make_viper_tree(root, n_frames=3):
    seq = "001"
    for sub in ("img", "flow", "inst", "camera"):
        os.makedirs(os.path.join(root, sub, seq)
                    if sub != "camera" else os.path.join(root, sub),
                    exist_ok=True)
    os.makedirs(os.path.join(root, "img", seq), exist_ok=True)
    os.makedirs(os.path.join(root, "flow", seq), exist_ok=True)
    os.makedirs(os.path.join(root, "inst", seq), exist_ok=True)

    img = np.full((1080, 1920, 3), 128, dtype=np.uint8)
    # Instance seg: a large car (class 24) block, instance id 0x0107.
    seg = np.zeros((1080, 1920, 3), dtype=np.uint8)
    seg[400:800, 400:1200] = (24, 1, 7)
    rows = []
    for i in range(n_frames):
        cv2.imwrite(os.path.join(root, "img", seq, f"{i:05d}.jpg"), img)
        cv2.imwrite(os.path.join(root, "inst", seq, f"{i:05d}.png"),
                    cv2.cvtColor(seg, cv2.COLOR_RGB2BGR))
        np.savez_compressed(
            os.path.join(root, "flow", seq, f"{i:05d}.npz"),
            u=np.zeros((1080, 1920), dtype=np.float32),
            v=np.zeros((1080, 1920), dtype=np.float32))
        proj = np.eye(4)
        view = np.eye(4)
        view[0, 3] = i
        rows.append(np.concatenate([[i], proj.ravel(), view.ravel()]))
    header = ",".join(["c"] * 33)
    np.savetxt(os.path.join(root, "camera", f"{seq}.csv"),
               np.stack(rows), delimiter=",", header=header, comments="")


def test_viper_dataset(tmp_path):
    from behindthescenes_tpu.datasets.viper import ViperDataset
    _make_viper_tree(str(tmp_path))
    ds = ViperDataset(str(tmp_path), frame_count=2, every_nth=1,
                      target_size=(128, 192))
    assert len(ds) == 2
    item = ds[0]
    assert item["imgs"].shape == (2, 128, 192, 3)
    assert item["projs"].shape == (2, 4, 4)
    assert item["poses"].shape == (2, 4, 4)
    np.testing.assert_allclose(item["poses"][:, 0, 3], [0.0, 1.0])
    # Segmentation: (cls, instance-id) channels; the car block is dynamic
    # with instance id 1*256+7.
    segs = item["segs"]
    assert segs.shape == (2, 128, 192, 2)
    assert segs[0, :, :, 0].max() == 1
    assert 256 + 7 in np.unique(segs[0, :, :, 1])
    assert item["flows"].shape == (1, 128, 192, 2)


# ---------------------------------------------------------------- TRI-PD

def _make_tri_pd_tree(root, n_frames=195, h=300, w=400):
    # files[1:] are train scenes; give two so train has one.
    for scene in ("scene_000000", "scene_000001"):
        base = os.path.join(root, scene)
        os.makedirs(os.path.join(base, "calibration"))
        calib = {
            "names": ["camera_01"],
            "extrinsics": [{"rotation": {"x": 0.0, "y": 0.0, "z": 0.0,
                                         "w": 1.0},
                            "translation": {"x": 1.0, "y": 2.0, "z": 3.0}}],
            "intrinsics": [{"fx": 968.0, "fy": 608.0, "cx": 968.0,
                            "cy": 608.0}],
        }
        with open(os.path.join(base, "calibration", "cal.json"), "w") as f:
            json.dump(calib, f)
        rgb_dir = os.path.join(base, "rgb", "camera_01")
        mask_dir = os.path.join(base, "moving_masks", "camera_01")
        os.makedirs(rgb_dir)
        os.makedirs(mask_dir)
        img = np.full((h, w, 3), 100, dtype=np.uint8)
        mask = np.zeros((h, w), dtype=np.uint16)
        # Big instance in the BOTTOM rows (the loader crops the top 158
        # rows post-resize); survives the <=50px filter.
        mask[240:300, 50:350] = 9
        mask[0, 0] = 77           # tiny instance gets mapped to 0
        for i in range(n_frames):
            name = f"{(i + 1) * 5:018d}.png"
            cv2.imwrite(os.path.join(rgb_dir, name), img)
            cv2.imwrite(os.path.join(mask_dir, name), mask)


def test_tri_pd_dataset(tmp_path):
    from behindthescenes_tpu.datasets.tri_pd import TRIPDDataset
    _make_tri_pd_tree(str(tmp_path))
    ds = TRIPDDataset(split="train", root=str(tmp_path),
                      supervision="moving", frame_count=2)
    assert len(ds) == 1
    item = ds[0]
    v, ih, iw, _ = item["imgs"].shape
    assert v == 2
    assert item["imgs"].min() >= -1.0 and item["imgs"].max() <= 1.0
    # quat identity + translation (1,2,3).
    np.testing.assert_allclose(item["poses"][0][:3, :3], np.eye(3),
                               atol=1e-6)
    np.testing.assert_allclose(item["poses"][0][:3, 3], [1.0, 2.0, 3.0])
    # NDC projection: fx*2/1936 = 1.0, cx/1936 - 0.5 = 0.
    np.testing.assert_allclose(item["projs"][0][0, 0], 1.0)
    np.testing.assert_allclose(item["projs"][0][0, 2], 0.0, atol=1e-6)
    segs = item["segs"]
    assert segs.shape == (2, ih, iw)
    # Tiny instance filtered, big one kept (relabeled, nonzero).
    assert segs[0].max() > 0
    assert segs[0, 0, 0] == 0


# ---------------------------------------------------------------- NYUv2

def test_nyu_depth_v2(tmp_path):
    import h5py
    from behindthescenes_tpu.datasets.nyu_depth_v2 import NYUDepthV2Dataset
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, 3, 64, 48), dtype=np.uint8)
    depths = rng.uniform(0.5, 10.0, (2, 64, 48)).astype(np.float32)
    with h5py.File(os.path.join(tmp_path, "nyu_depth_v2_labeled.mat"),
                   "w") as f:
        f.create_dataset("images", data=imgs)
        f.create_dataset("depths", data=depths)

    ds = NYUDepthV2Dataset(str(tmp_path), target_image_size=(48, 64))
    assert len(ds) == 2
    item = ds[1]
    assert item["imgs"].shape == (1, 48, 64, 3)
    assert item["depths"].shape == (1, 1, 48, 64)
    np.testing.assert_allclose(item["poses"][0], np.eye(4))
    # images stored (3, W, H) -> transposed to (H, W, 3), [-1, 1].
    expect = np.transpose(imgs[1], (2, 1, 0)).astype(np.float32) / 255.0
    np.testing.assert_allclose(item["imgs"][0], expect * 2 - 1, atol=1e-6)
    np.testing.assert_allclose(item["depths"][0, 0],
                               np.transpose(depths[1], (1, 0)))


# ------------------------------------------------------- KITTI Odometry

def _make_odom_tree(root, n_frames=6):
    seq_dir = os.path.join(root, "sequences", "00")
    os.makedirs(os.path.join(seq_dir, "image_2"))
    os.makedirs(os.path.join(seq_dir, "image_3"))
    os.makedirs(os.path.join(root, "poses"))
    fx, fy, cx, cy = 718.856, 718.856, 607.19, 185.22
    baseline_px = -386.1448  # P3 tx (KITTI grayscale-right style)
    p2 = [fx, 0, cx, 0, 0, fy, cy, 0, 0, 0, 1, 0]
    p3 = [fx, 0, cx, baseline_px, 0, fy, cy, 0, 0, 0, 1, 0]
    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        f.write("P2: " + " ".join(str(v) for v in p2) + "\n")
        f.write("P3: " + " ".join(str(v) for v in p3) + "\n")
    img = np.full((376, 1241, 3), 90, dtype=np.uint8)
    for i in range(n_frames):
        cv2.imwrite(os.path.join(seq_dir, "image_2", f"{i:06d}.png"), img)
        cv2.imwrite(os.path.join(seq_dir, "image_3", f"{i:06d}.png"), img)
    with open(os.path.join(root, "poses", "00.txt"), "w") as f:
        for i in range(n_frames):
            mat = np.eye(4)[:3]
            mat[0, 3] = float(i)  # x-translation = frame id
            f.write(" ".join(str(v) for v in mat.ravel()) + "\n")


def test_kitti_odometry(tmp_path):
    from behindthescenes_tpu.datasets.kitti_odom import KittiOdometryDataset
    _make_odom_tree(str(tmp_path))
    ds = KittiOdometryDataset(str(tmp_path), frame_count=2,
                              sequences=["00"],
                              target_image_size=(64, 128),
                              return_stereo=True)
    assert len(ds) == 4
    item = ds[1]
    # 2 temporal frames x (mono + stereo).
    assert item["imgs"].shape == (4, 64, 128, 3)
    assert item["projs"].shape == (4, 3, 3)
    # keyframe_idx = fc//2 = 1: frame ids are [1, 2], keyframe-first
    # reordering puts frame 2's pose first.
    np.testing.assert_allclose(item["poses"][0][0, 3], 2.0)
    np.testing.assert_allclose(item["poses"][1][0, 3], 1.0)
    # Stereo poses sit one baseline (P3 tx / fx = 0.537m) to the right.
    np.testing.assert_allclose(
        item["poses"][2][0, 3] - item["poses"][0][0, 3],
        386.1448 / 718.856, rtol=1e-4)
    assert np.all(item["ids"] == [1, 2])


def test_kitti_odometry_factory(tmp_path):
    from behindthescenes_tpu.datasets.factory import make_datasets
    _make_odom_tree(str(tmp_path))
    train, test = make_datasets({
        "type": "KITTI_Odometry", "data_path": str(tmp_path),
        "image_size": (64, 128), "data_fc": 2,
        "train_sequences": ["00"], "test_sequences": ["00"]})
    assert len(train) == len(test) == 4
    assert train[0]["imgs"].shape == (2, 64, 128, 3)
