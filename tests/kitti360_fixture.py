"""Shared builder for a miniature KITTI-360 tree (used by dataset and
evaluator tests)."""
import cv2
import numpy as np
import yaml

SEQ = "2013_05_28_drive_0000_sync"
HP, WP = 376, 1408
HF, WF = 700, 700

FISH_CALIB = {
    "mirror_parameters": {"xi": 2.2},
    "distortion_parameters": {"k1": 0.02, "k2": -0.005},
    "projection_parameters": {"gamma1": 1.4, "gamma2": 1.5,
                              "u0": 0.01, "v0": -0.02},
    "image_height": HF, "image_width": WF,
}


def build_kitti360_tree(root, n_frames=5):
    root.mkdir(exist_ok=True)
    data = root / "data"
    rng = np.random.default_rng(0)

    calib = data / "calibration"
    calib.mkdir(parents=True)
    k = np.array([[600.0, 0, WP / 2, 0], [0, 600.0, HP / 2, 0],
                  [0, 0, 1, 0]])
    with open(calib / "perspective.txt", "w") as f:
        f.write(f"S_rect_00: {WP} {HP}\n")
        f.write("P_rect_00: " + " ".join(map(str, k.ravel())) + "\n")
        f.write("P_rect_01: " + " ".join(map(str, k.ravel())) + "\n")
        f.write("R_rect_00: " + " ".join(map(str, np.eye(3).ravel())) + "\n")
        f.write("R_rect_01: " + " ".join(map(str, np.eye(3).ravel())) + "\n")
    with open(calib / "calib_cam_to_pose.txt", "w") as f:
        for cam, tx in (("image_00", 0.0), ("image_01", 0.6),
                        ("image_02", -0.1), ("image_03", 0.7)):
            t = np.eye(4)[:3].copy()
            t[0, 3] = tx
            f.write(f"{cam}: " + " ".join(map(str, t.ravel())) + "\n")
    with open(calib / "calib_cam_to_velo.txt", "w") as f:
        t = np.eye(4)[:3].copy()
        t[2, 3] = -0.3
        f.write(" ".join(map(str, t.ravel())) + "\n")
    for name in ("image_02.yaml", "image_03.yaml"):
        with open(calib / name, "w") as f:
            f.write("%YAML:1.0\n")
            yaml.safe_dump(FISH_CALIB, f)

    seq_dir = data / "data_2d_raw" / SEQ
    for cam, size in (("image_00", (HP, WP)), ("image_01", (HP, WP)),
                      ("image_02", (HF, WF)), ("image_03", (HF, WF))):
        d = seq_dir / cam / ("data_rect" if cam in ("image_00", "image_01")
                             else "data_rgb")
        d.mkdir(parents=True)
        for i in range(n_frames):
            img = rng.integers(0, 255, size + (3,), dtype=np.uint8)
            cv2.imwrite(str(d / f"{i:010d}.png"), img)

    velo_dir = data / "data_3d_raw" / SEQ / "velodyne_points" / "data"
    velo_dir.mkdir(parents=True)
    # calib_cam_to_velo has identity rotation here, so the velodyne frame is
    # camera-like: z forward.
    pts = np.concatenate([
        rng.uniform(-8, 8, (400, 1)), rng.uniform(-1.5, 0.5, (400, 1)),
        rng.uniform(3, 30, (400, 1)), np.ones((400, 1))],
        axis=1).astype(np.float32)
    for i in range(n_frames):
        pts.tofile(str(velo_dir / f"{i:010d}.bin"))

    poses_dir = root / "poses" / SEQ
    poses_dir.mkdir(parents=True)
    with open(poses_dir / "poses.txt", "w") as f:
        for i in range(n_frames):
            pose = np.eye(4)
            pose[2, 3] = i * 1.1
            f.write(f"{i} " + " ".join(map(str, pose[:3].ravel())) + "\n")

    split = root / "split"
    split.mkdir()
    with open(split / "test_files.txt", "w") as f:
        f.write(f"{SEQ} 2 l\n")
    return root
