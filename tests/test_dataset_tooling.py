"""Tests for the offline dataset tooling scripts
(reference datasets/*/compute_*.py, preprocess_kitti_360.py): split
generation and KITTI-360 offline preprocessing run hermetically against
miniature trees. The download/extract tools (RE10K youtube fetch, Waymo
tfrecord extraction, ORB-SLAM runner) need external binaries/data and are
exercised only for CLI wiring elsewhere.
"""
import importlib.util
import os
import sys
from pathlib import Path

import cv2
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_script(rel_path):
    path = os.path.join(REPO, rel_path)
    name = "tooling_" + os.path.basename(rel_path)[:-3]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ------------------------------------------------- KITTI-Raw splits

def _make_kitti_raw_stub(root, sequences, n_frames=2):
    for seq in sequences:
        day = seq[:10]
        d = Path(root) / day / seq / "image_02" / "data"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n_frames):
            (d / f"{i:010d}.png").touch()


def test_kitti_raw_nvs_split(tmp_path):
    mod = load_script("scripts/datasets/compute_kitti_raw_splits.py")
    data = tmp_path / "data"
    out = tmp_path / "splits"
    _make_kitti_raw_stub(data, mod.CITY_SEQUENCES)
    mod.nvs_split(data, out)

    lines = {}
    for name in ("train", "val", "test"):
        with open(out / f"{name}_files.txt") as f:
            lines[name] = [ln for ln in f.read().splitlines() if ln]
    # 28 city seqs -> 20/4/4; train includes right-camera datapoints (x2).
    assert len(lines["train"]) == 20 * 2 * 2
    assert len(lines["val"]) == 4 * 2
    assert len(lines["test"]) == 4 * 2
    # No sequence leaks across splits.
    seq_of = lambda ln: ln.split(" ")[0]
    for a, b in (("train", "val"), ("train", "test"), ("val", "test")):
        assert not ({seq_of(l) for l in lines[a]}
                    & {seq_of(l) for l in lines[b]})
    # Deterministic: RandomState(0) shuffle -> stable split membership.
    again = tmp_path / "splits2"
    mod.nvs_split(data, again)
    with open(again / "train_files.txt") as f:
        assert [ln for ln in f.read().splitlines() if ln] == lines["train"]
    # Line format "day/seq frame suffix".
    day, rest = lines["train"][0].split("/", 1)
    assert day.startswith("2011_")
    assert rest.split(" ")[2] in ("l", "r")


def test_kitti_raw_seq_split(tmp_path):
    mod = load_script("scripts/datasets/compute_kitti_raw_splits.py")
    data = tmp_path / "data"
    out = tmp_path / "splits"
    seq = "2011_09_26_drive_0001_sync"
    _make_kitti_raw_stub(data, [seq], n_frames=3)
    mod.seq_split(data, out, seq)
    with open(out / f"{seq}_files.txt") as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    assert lines == [f"2011_09_26/{seq} {i:010d} l" for i in range(3)]


# ------------------------------------------- KITTI-360 bbox split

def test_kitti_360_bbox_split(tmp_path, monkeypatch, capsys):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    try:
        from kitti360_fixture import build_kitti360_tree, SEQ
    finally:
        sys.path.pop(0)
    root = tmp_path / "kitti360"
    root.mkdir()
    build_kitti360_tree(root)

    sem = root / "data" / "data_2d_semantics" / "train"
    sem.mkdir(parents=True)
    frame_line = lambda i: \
        f"train/{SEQ}/image_00/data_rect/{i:010d}.png x\n"
    with open(sem / "2013_05_28_drive_train_frames.txt", "w") as f:
        f.writelines(frame_line(i) for i in (0, 1))
    with open(sem / "2013_05_28_drive_val_frames.txt", "w") as f:
        # Frame 9 fails the integrity check (fixture has 5 frames).
        f.writelines(frame_line(i) for i in (0, 1, 2, 3, 4, 9))

    mod = load_script("scripts/datasets/compute_kitti_360_bbox_split.py")
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "x", "-d", str(root / "data"), "-o", str(out), "--offset", "2"])
    mod.main()

    read = lambda n: [ln for ln in
                      open(out / f"{n}_files.txt").read().splitlines() if ln]
    # train: 2 frames x (l, r).
    assert read("train") == [f"{SEQ} {i:010d} {s}" for i in (0, 1)
                             for s in ("l", "r")]
    # val list indices 0,2,4 -> test; 1,3 -> val; index 5 (frame 9) invalid.
    assert read("val") == [f"{SEQ} {i:010d} l" for i in (1, 3)]
    assert read("test") == [f"{SEQ} {i:010d} l" for i in (0, 2, 4)]
    assert "invalid=1" in capsys.readouterr().out


# ------------------------------------------- RE10K MINE split

def test_process_mine_split(tmp_path, monkeypatch):
    import json
    import pickle

    data = tmp_path / "re10k"
    data.mkdir()
    seq_data = {"seqA": {"timestamps": np.array([100, 200, 300],
                                                np.int64)}}
    with open(data / "test.pickle", "wb") as f:
        pickle.dump(seq_data, f)

    split = tmp_path / "mine"
    split.mkdir()
    pairs = [{"sequence_id": "seqA", "src_img_obj": {"frame_ts": "200"}},
             {"sequence_id": "missing", "src_img_obj": {"frame_ts": "1"}}]
    for fname in ("validation_pairs.json", "test_pairs.json"):
        with open(split / fname, "w") as f:
            f.write("\n".join(json.dumps(p) for p in pairs))

    mod = load_script("scripts/datasets/process_mine_split.py")
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "x", "-d", str(data), "-s", str(split), "-o", str(out)])
    mod.main()

    for mode in ("val", "test"):
        with open(out / f"{mode}_files.txt") as f:
            assert f.read().splitlines() == ["seqA 1"]

    # The loader's index parser consumes the output format directly.
    from behindthescenes_tpu.datasets.realestate10k import (
        RealEstate10kDataset)
    assert RealEstate10kDataset._load_index(
        str(out / "test_files.txt")) == [("seqA", 1)]


# ------------------------------------------- KITTI-360 preprocessing

def test_preprocess_kitti_360(tmp_path, monkeypatch):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    try:
        from kitti360_fixture import build_kitti360_tree, SEQ
    finally:
        sys.path.pop(0)
    root = tmp_path / "kitti360"
    root.mkdir()
    build_kitti360_tree(root)
    data = root / "data"
    # The preprocessing tool expects poses at <data>/data_poses.
    os.symlink(root / "poses", data / "data_poses")

    mod = load_script("scripts/datasets/preprocess_kitti_360.py")
    monkeypatch.setattr(sys, "argv", [
        "x", "-d", str(data), "-r", "48", "176", "-f", "0", "-15"])
    mod.main()

    persp = data / "data_2d_raw" / SEQ / "image_00" / "data_48x176"
    fish = data / "data_2d_raw" / SEQ / "image_02" / "data_48x176_0x-15"
    assert persp.is_dir() and fish.is_dir()
    sample = cv2.imread(str(next(persp.glob("*.png"))))
    assert sample.shape == (48, 176, 3)
    assert cv2.imread(str(next(fish.glob("*.png")))).shape == (48, 176, 3)

    # The dataset's is_preprocessed fast path consumes the outputs and
    # matches the on-the-fly resample to 8-bit round-off.
    from behindthescenes_tpu.datasets.kitti_360 import Kitti360Dataset
    common = dict(
        data_path=str(data), pose_path=str(root / "poses"),
        split_path=None, target_image_size=(48, 176),
        return_stereo=True, return_fisheye=True, frame_count=1,
        fisheye_rotation=(0, -15))
    pre = Kitti360Dataset(is_preprocessed=True, **common)
    live = Kitti360Dataset(is_preprocessed=False, **common)
    a, b = pre[0], live[0]
    assert a["imgs"].shape == b["imgs"].shape
    # 8-bit quantization + one extra resize round trip.
    assert np.abs(a["imgs"] - b["imgs"]).max() <= 0.05
    np.testing.assert_allclose(a["poses"], b["poses"])


# ------------------------------------------------- ORB-SLAM settings

def test_gen_orbslam_settings(tmp_path, monkeypatch, capsys):
    mod = load_script("scripts/datasets/gen_orbslam_settings.py")
    data = tmp_path / "data"
    day = "2011_09_26"
    (data / day).mkdir(parents=True)
    fx, fy, cx, cy, b = 721.5377, 721.5377, 609.5593, 172.854, 0.53267221
    p_l = np.array([[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0]])
    p_r = p_l.copy()
    p_r[0, 3] = -b * fx
    with open(data / day / "calib_cam_to_cam.txt", "w") as f:
        f.write("P_rect_02: " + " ".join(map(str, p_l.ravel())) + "\n")
        f.write("P_rect_03: " + " ".join(map(str, p_r.ravel())) + "\n")
        f.write("S_rect_02: 1242 375\n")
    out = tmp_path / "settings"
    monkeypatch.setattr(sys, "argv",
                        ["gen", "-d", str(data), "-o", str(out)])
    mod.main()
    assert "wrote" in capsys.readouterr().out

    # Validate through OpenCV FileStorage — the exact parser ORB-SLAM
    # uses to consume these files.
    fs = cv2.FileStorage(str(out / f"{day}.yaml"), cv2.FILE_STORAGE_READ)
    try:
        assert fs.getNode("Camera.type").string() == "Rectified"
        np.testing.assert_allclose(fs.getNode("Camera1.fx").real(), fx,
                                   rtol=1e-6)
        np.testing.assert_allclose(fs.getNode("Camera1.cy").real(), cy,
                                   rtol=1e-6)
        np.testing.assert_allclose(fs.getNode("Stereo.b").real(), b,
                                   rtol=1e-6)
        assert fs.getNode("Camera.width").real() == 1242
        assert fs.getNode("Camera.height").real() == 375
        assert fs.getNode("ORBextractor.nFeatures").real() == 2000
    finally:
        fs.release()

    # Missing calib -> clear error, not a silent empty run.
    import pytest
    empty = tmp_path / "nodata"
    empty.mkdir()
    monkeypatch.setattr(sys, "argv",
                        ["gen", "-d", str(empty), "-o", str(out)])
    with pytest.raises(SystemExit, match="no day directories"):
        mod.main()
