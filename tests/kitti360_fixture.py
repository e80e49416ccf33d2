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


def _cube_vertices(center, size):
    cx, cy, cz = center
    s = size / 2.0
    return np.array([[cx + dx * s, cy + dy * s, cz + dz * s]
                     for dx in (-1, 1) for dy in (-1, 1) for dz in (-1, 1)],
                    dtype=np.float64)


_CUBE_FACES = np.array(
    [[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5], [0, 4, 5], [0, 5, 1],
     [2, 3, 7], [2, 7, 6], [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]],
    dtype=np.int64)


def add_bboxes_and_semantics(root, n_frames=5):
    """Augment a `build_kitti360_tree` tree with the assets the 3D-bbox
    occupancy benchmark consumes: static car boxes in
    data_3d_bboxes/train_full/<seq>.xml (reference annotation.py schema)
    and per-frame semantic label maps (data_2d_semantics)."""
    import xml.etree.ElementTree as ET
    data = root / "data"
    # Two static cars along the drive (poses advance z by 1.1/frame).
    boxes = [(26, 1, (1.5, 0.4, 10.0), 2.0), (26, 2, (-2.0, 0.4, 22.0), 2.5)]
    xroot = ET.Element("opencv_storage")
    for sem_id, inst, center, size in boxes:
        obj = ET.SubElement(xroot, "object")
        ET.SubElement(obj, "semanticId").text = str(sem_id)
        ET.SubElement(obj, "instanceId").text = str(inst)
        ET.SubElement(obj, "timestamp").text = "-1"
        ET.SubElement(obj, "label").text = "car"
        tr = ET.SubElement(obj, "transform")
        ET.SubElement(tr, "data").text = " ".join(
            map(str, np.eye(4).ravel()))
        vt = ET.SubElement(obj, "vertices")
        ET.SubElement(vt, "data").text = " ".join(
            map(str, _cube_vertices(center, size).ravel()))
        fc = ET.SubElement(obj, "faces")
        ET.SubElement(fc, "data").text = " ".join(
            map(str, _CUBE_FACES.astype(np.float64).ravel()))
    bbox_dir = data / "data_3d_bboxes" / "train_full"
    bbox_dir.mkdir(parents=True, exist_ok=True)
    ET.ElementTree(xroot).write(bbox_dir / f"{SEQ}.xml")

    # Semantic maps: road (7) with a central car (26) blob. The benchmark
    # only needs label-consistent pixels for the labeled ray/box
    # intercepts; semantic_rgb existence gates the semantics split.
    sem = data / "data_2d_semantics" / "train" / SEQ / "image_00"
    (sem / "semantic").mkdir(parents=True, exist_ok=True)
    (sem / "semantic_rgb").mkdir(parents=True, exist_ok=True)
    seg = np.full((HP, WP), 7, dtype=np.uint8)
    seg[HP // 3: 2 * HP // 3, WP // 3: 2 * WP // 3] = 26
    for i in range(n_frames):
        cv2.imwrite(str(sem / "semantic" / f"{i:010d}.png"), seg)
        cv2.imwrite(str(sem / "semantic_rgb" / f"{i:010d}.png"),
                    np.stack([seg] * 3, -1))
    return root
