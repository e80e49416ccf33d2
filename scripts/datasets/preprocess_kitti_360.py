"""Offline KITTI-360 preprocessing
(reference datasets/kitti_360/preprocess_kitti_360.py:17-81): resize
perspective frames and resample fisheye frames to pinhole at the target
resolution once, so training skips the per-sample remap (the dataset's
`is_preprocessed=True` fast path).

Usage:
  python scripts/datasets/preprocess_kitti_360.py -d data/KITTI-360 \
      [-r 192 640] [-f 0 -15] [--only-fisheye]
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import cv2
import numpy as np

from behindthescenes_tpu.datasets.kitti_360 import Kitti360Dataset


def main():
    parser = argparse.ArgumentParser("KITTI-360 preprocessing")
    parser.add_argument("--data-path", "-d", required=True)
    parser.add_argument("--resolution", "-r", type=int, nargs=2,
                        default=(192, 640))
    parser.add_argument("--fisheye-rotation", "-f", type=int, nargs=2,
                        default=(0, -15))
    parser.add_argument("--only-fisheye", "-o", action="store_true")
    args = parser.parse_args()

    data_path = Path(args.data_path)
    res = tuple(args.resolution)
    rot = tuple(args.fisheye_rotation)

    dataset = Kitti360Dataset(
        data_path=str(data_path), pose_path=str(data_path / "data_poses"),
        split_path=None, target_image_size=res, return_stereo=True,
        return_fisheye=True, frame_count=1, fisheye_rotation=rot)

    persp = f"data_{res[0]}x{res[1]}"
    fish = f"data_{res[0]}x{res[1]}_{rot[0]}x{rot[1]}"

    for i in range(len(dataset)):
        seq, frame, is_right = dataset._datapoints[i]
        if is_right:
            continue
        img_id = dataset._img_ids[seq][frame]
        dirs = {
            "image_00": data_path / "data_2d_raw" / seq / "image_00" / persp,
            "image_01": data_path / "data_2d_raw" / seq / "image_01" / persp,
            "image_02": data_path / "data_2d_raw" / seq / "image_02" / fish,
            "image_03": data_path / "data_2d_raw" / seq / "image_03" / fish,
        }
        if (dirs["image_00"] / f"{img_id:010d}.png").exists():
            continue
        data = dataset[i]
        for d in dirs.values():
            d.mkdir(exist_ok=True, parents=True)
        # Order: persp left, persp right, fisheye left, fisheye right
        # (frame_count=1, return_stereo + return_fisheye).
        for cam_i, cam in enumerate(("image_00", "image_01", "image_02",
                                     "image_03")):
            if args.only_fisheye and cam in ("image_00", "image_01"):
                continue
            img = (data["imgs"][cam_i] * 0.5 + 0.5) * 255.0
            cv2.imwrite(str(dirs[cam] / f"{img_id:010d}.png"),
                        cv2.cvtColor(img.astype(np.uint8),
                                     cv2.COLOR_RGB2BGR))
        if i % 100 == 0:
            print(f"{i}/{len(dataset)}")


if __name__ == "__main__":
    main()
