"""Extract Waymo Open Dataset TFRecords into the folder layout
WaymoDataset reads (reference datasets/waymo/extract_waymo.py): per
sequence — frames/cam_0N/<id>.jpg (undistorted + resized), lidar/<id>.npy,
poses.npy (camera-0 canonical frame), calibration.pkl ({dims, extrinsics,
proj_mats}) and exposures.pkl.

Requires `tensorflow` and `waymo_open_dataset` (external tools; only needed
for this offline step, not the framework runtime).

Usage:
  python scripts/datasets/extract_waymo.py -i tfrecords/ -o data/waymo/training
"""
from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np

# Waymo camera frame (x fwd, y left, z up) -> canonical (x right, y down,
# z forward), reference extract_waymo.py:31-38.
AXIS_SWAP = np.array([
    [0, -1, 0, 0],
    [0, 0, -1, 0],
    [1, 0, 0, 0],
    [0, 0, 0, 1]], dtype=np.float32)
AXIS_SWAP_INV = np.linalg.inv(AXIS_SWAP)


def get_proj_mat(intr, dims):
    h, w = dims
    return np.array([
        [intr[0] * 2 / w, 0, intr[2] * 2 / w - 1.0],
        [0, intr[1] * 2 / h, intr[3] * 2 / h - 1.0],
        [0, 0, 1]], dtype=np.float32)


def main():
    parser = argparse.ArgumentParser("Waymo extraction")
    parser.add_argument("--data-in", "-i", required=True)
    parser.add_argument("--data-out", "-o", required=True)
    parser.add_argument("--resolution", "-r", type=int, nargs=2,
                        default=(320, 480))
    parser.add_argument("--points", action="store_true",
                        help="also extract lidar point clouds")
    args = parser.parse_args()

    try:
        import tensorflow.compat.v1 as tf
        tf.enable_eager_execution()
        from waymo_open_dataset.utils import frame_utils
        from waymo_open_dataset import dataset_pb2 as open_dataset
    except ImportError as e:
        raise SystemExit(
            f"extract_waymo needs tensorflow + waymo_open_dataset: {e}")
    import cv2

    data_in = Path(args.data_in)
    data_out = Path(args.data_out)
    data_out.mkdir(parents=True, exist_ok=True)
    res = tuple(args.resolution)

    for record in sorted(data_in.glob("*.tfrecord")):
        dataset = tf.data.TFRecordDataset(str(record), compression_type="")
        base = open_dataset.Frame()
        base.ParseFromString(bytearray(next(iter(dataset)).numpy()))

        seq_dir = data_out / base.context.name
        seq_dir.mkdir(exist_ok=True)
        calibs = {cc.name: cc for cc in base.context.camera_calibrations}
        intr = {n: np.array(list(cc.intrinsic), dtype=np.float32)
                for n, cc in calibs.items()}
        dims = {n: (cc.height, cc.width) for n, cc in calibs.items()}
        extrinsics = {n: np.array(list(cc.extrinsic.transform),
                                  dtype=np.float32).reshape(4, 4)
                      @ AXIS_SWAP_INV for n, cc in calibs.items()}
        proj_mats = {n: get_proj_mat(v, dims[n]) for n, v in intr.items()}
        dist = {n: np.array(v[4:9], dtype=np.float32)
                for n, v in intr.items()}

        with (seq_dir / "calibration.pkl").open("wb") as f:
            pickle.dump({"dims": res, "extrinsics": extrinsics,
                         "proj_mats": proj_mats}, f)

        cam_dirs = {}
        for n in calibs:
            cam_dirs[n] = seq_dir / "frames" / f"cam_{n:02d}"
            cam_dirs[n].mkdir(parents=True, exist_ok=True)
        lidar_dir = seq_dir / "lidar"
        lidar_dir.mkdir(exist_ok=True)

        # Undistortion maps at source resolution.
        umaps = {}
        for n in calibs:
            h, w = dims[n]
            k = proj_mats[n].copy()
            k[0, 0] *= 0.5 * w
            k[0, 2] = (k[0, 2] * 0.5 + 0.5) * w
            k[1, 1] *= 0.5 * h
            k[1, 2] = (k[1, 2] * 0.5 + 0.5) * h
            umaps[n] = cv2.initUndistortRectifyMap(
                k, dist[n], np.eye(3), k, (w, h), cv2.CV_16SC2)

        poses = []
        exposures = {n: [] for n in calibs}
        for i, data in enumerate(dataset):
            frame = open_dataset.Frame()
            frame.ParseFromString(bytearray(data.numpy()))
            poses.append(np.array(list(frame.pose.transform),
                                  dtype=np.float32).reshape(4, 4))
            for img in frame.images:
                exposures[img.name].append(img.shutter)
                raw = tf.image.decode_jpeg(img.image).numpy()
                und = cv2.remap(raw, umaps[img.name][0], umaps[img.name][1],
                                cv2.INTER_LINEAR)
                und = cv2.resize(und, (res[1], res[0]),
                                 interpolation=cv2.INTER_AREA)
                cv2.imwrite(str(cam_dirs[img.name] / f"{i:010d}.jpg"),
                            cv2.cvtColor(und, cv2.COLOR_RGB2BGR))
            if args.points:
                ri, cp, _, top_pose = \
                    frame_utils.parse_range_image_and_camera_projection(frame)
                pts, _ = frame_utils.convert_range_image_to_point_cloud(
                    frame, ri, cp, top_pose)
                np.save(str(lidar_dir / f"{i:010d}.npy"),
                        np.concatenate(pts, axis=0))
        np.save(str(seq_dir / "poses.npy"), np.stack(poses))
        with (seq_dir / "exposures.pkl").open("wb") as f:
            pickle.dump({n: np.array(v) for n, v in exposures.items()}, f)
        print(f"{base.context.name}: {len(poses)} frames")


if __name__ == "__main__":
    main()
