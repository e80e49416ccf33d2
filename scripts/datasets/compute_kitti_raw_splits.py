"""KITTI-Raw split computation
(reference datasets/kitti_raw/compute_kitti_raw_nvs_split.py and
compute_kitti_raw_seq_split.py).

Two modes:
  * nvs: Tulsiani-et-al-style NVS split over the 28 city sequences, shuffled
    with numpy RandomState(0) (matching layered-scene-inference), 70/15/15
    train/val/test; train additionally includes right-camera datapoints.
  * seq: one split file listing every frame of a single sequence.

Usage:
  python scripts/datasets/compute_kitti_raw_splits.py nvs -d data/KITTI-Raw \
      -o datasets/kitti_raw/splits/nvs
  python scripts/datasets/compute_kitti_raw_splits.py seq -d data/KITTI-Raw \
      -o out/splits -s 2011_09_26_drive_0001_sync
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

# City sequences used by the NVS benchmark (Tulsiani et al.).
CITY_SEQUENCES = [
    "2011_09_26_drive_0001_sync", "2011_09_26_drive_0002_sync",
    "2011_09_26_drive_0005_sync", "2011_09_26_drive_0009_sync",
    "2011_09_26_drive_0011_sync", "2011_09_26_drive_0013_sync",
    "2011_09_26_drive_0014_sync", "2011_09_26_drive_0017_sync",
    "2011_09_26_drive_0018_sync", "2011_09_26_drive_0048_sync",
    "2011_09_26_drive_0051_sync", "2011_09_26_drive_0056_sync",
    "2011_09_26_drive_0057_sync", "2011_09_26_drive_0059_sync",
    "2011_09_26_drive_0060_sync", "2011_09_26_drive_0084_sync",
    "2011_09_26_drive_0091_sync", "2011_09_26_drive_0093_sync",
    "2011_09_26_drive_0095_sync", "2011_09_26_drive_0096_sync",
    "2011_09_26_drive_0104_sync", "2011_09_26_drive_0106_sync",
    "2011_09_26_drive_0113_sync", "2011_09_26_drive_0117_sync",
    "2011_09_28_drive_0001_sync", "2011_09_28_drive_0002_sync",
    "2011_09_29_drive_0026_sync", "2011_09_29_drive_0071_sync",
]


def seq_lines(data_path: Path, seq: str, camera_suffixes=("l",)):
    day = seq[:10]
    img_dir = data_path / day / seq / "image_02" / "data"
    n = len(sorted(img_dir.iterdir()))
    lines = []
    for suffix in camera_suffixes:
        lines += [f"{day}/{seq} {i:010d} {suffix}" for i in range(n)]
    return lines


def nvs_split(data_path: Path, out_path: Path):
    out_path.mkdir(parents=True, exist_ok=True)
    seqs = list(CITY_SEQUENCES)
    # RandomState(0) shuffle matches the upstream NVS benchmark exactly.
    rng = np.random.RandomState(0)
    rng.shuffle(seqs)
    n_all = len(seqs)
    n_train = int(round(0.7 * n_all))
    n_val = int(round(0.15 * n_all))
    splits = {
        "train": seqs[:n_train],
        "val": seqs[n_train:n_train + n_val],
        "test": seqs[n_train + n_val:],
    }
    for name, split_seqs in splits.items():
        lines = []
        for seq in split_seqs:
            suffixes = ("l", "r") if name == "train" else ("l",)
            lines += seq_lines(data_path, seq, suffixes)
        with open(out_path / f"{name}_files.txt", "w") as f:
            f.write("\n".join(lines))
        print(f"{name}: {len(lines)} datapoints from {len(split_seqs)} seqs")


def seq_split(data_path: Path, out_path: Path, seq: str):
    out_path.mkdir(parents=True, exist_ok=True)
    lines = seq_lines(data_path, seq)
    with open(out_path / f"{seq}_files.txt", "w") as f:
        f.write("\n".join(lines))
    print(f"{seq}: {len(lines)} datapoints")


def main():
    parser = argparse.ArgumentParser("KITTI-Raw splits")
    parser.add_argument("mode", choices=["nvs", "seq"])
    parser.add_argument("--data-path", "-d", required=True)
    parser.add_argument("--out-path", "-o", required=True)
    parser.add_argument("--seq", "-s", default=None)
    args = parser.parse_args()
    if args.mode == "nvs":
        nvs_split(Path(args.data_path), Path(args.out_path))
    else:
        assert args.seq, "--seq required for seq mode"
        seq_split(Path(args.data_path), Path(args.out_path), args.seq)


if __name__ == "__main__":
    main()
