"""Waymo MVS split (reference datasets/waymo/compute_waymo_mvs_split.py):
keep frames with enough ego-motion (inter-frame distance > min_d on either
side), optionally day-time only (needs the original TFRecords +
waymo_open_dataset to read time-of-day).

Usage:
  python scripts/datasets/compute_waymo_mvs_split.py -d data/waymo -o splits/
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def check_time_of_day(records: Path, seq: str) -> str:
    import tensorflow.compat.v1 as tf
    tf.enable_eager_execution()
    from waymo_open_dataset import dataset_pb2 as open_dataset
    record = records / f"segment-{seq}_with_camera_labels.tfrecord"
    dataset = tf.data.TFRecordDataset(str(record), compression_type="")
    frame = open_dataset.Frame()
    frame.ParseFromString(bytearray(next(iter(dataset)).numpy()))
    return frame.context.stats.time_of_day


def main():
    parser = argparse.ArgumentParser("Waymo MVS split")
    parser.add_argument("--data-path", "-d", required=True)
    parser.add_argument("--out-path", "-o", required=True)
    parser.add_argument("--min-d", type=float, default=0.5)
    parser.add_argument("--day-only", action="store_true")
    parser.add_argument("--train-records", default="")
    parser.add_argument("--val-records", default="")
    parser.add_argument("--test-records", default="")
    args = parser.parse_args()

    from behindthescenes_tpu.datasets.waymo import WaymoDataset

    out_path = Path(args.out_path)
    out_path.mkdir(parents=True, exist_ok=True)

    splits = [("training", "train", args.train_records),
              ("validation", "val", args.val_records),
              ("testing", "test", args.test_records)]

    for mode, short, records in splits:
        try:
            ds = WaymoDataset(args.data_path, mode, None, return_45=False,
                              return_90=False, frame_count=1)
        except FileNotFoundError:
            print(f"{mode}: not found, skipping")
            continue
        files = []
        for seq in ds._sequences:
            if args.day_only and records:
                if check_time_of_day(Path(records), seq) != "Day":
                    continue
            positions = ds._poses[seq][:, :3, 3]
            dists = np.linalg.norm(positions[1:] - positions[:-1], axis=-1)
            valid = dists > args.min_d
            valid = valid[1:] | valid[:-1]
            files += [f"{seq} {i + 1:010d}" for i in valid.nonzero()[0]]
        print(f"{short}: {len(files)} samples")
        with open(out_path / f"{short}_files.txt", "w") as f:
            f.write("\n".join(files))


if __name__ == "__main__":
    main()
