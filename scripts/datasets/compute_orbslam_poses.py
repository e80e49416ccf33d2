"""Run ORB-SLAM3 over KITTI-Raw sequences to produce the camera pose files
the KITTI-Raw dataset reads (reference
datasets/kitti_raw/compute_orbslam_poses.py). Requires a (modified)
ORB-SLAM3 executable that writes one 3x4 row-major pose per line; the
original authors also publish precomputed poses.

Usage:
  python scripts/datasets/compute_orbslam_poses.py -e ORB_SLAM3/kitti_raw \
      -v ORBvoc.txt -s settings_dir -d data/KITTI-Raw -o poses_out
"""
from __future__ import annotations

import argparse
import subprocess
from pathlib import Path


def get_sequences(data_path: Path):
    out = []
    for day in data_path.iterdir():
        if not day.is_dir():
            continue
        out += [(day.name, seq.name) for seq in day.iterdir()
                if seq.is_dir()]
    return out


def main():
    parser = argparse.ArgumentParser("KITTI-Raw ORB-SLAM3 pose runner")
    parser.add_argument("--exe-path", "-e", required=True)
    parser.add_argument("--vocab-path", "-v", required=True)
    parser.add_argument("--settings-path", "-s", required=True)
    parser.add_argument("--data-path", "-d", required=True)
    parser.add_argument("--out-path", "-o", required=True)
    args = parser.parse_args()

    out_root = Path(args.out_path)
    out_root.mkdir(parents=True, exist_ok=True)
    sequences = get_sequences(Path(args.data_path))
    print(f"{len(sequences)} sequences")

    for i, (day, seq) in enumerate(sequences):
        seq_out = out_root / day
        seq_out.mkdir(exist_ok=True)
        seq_out_file = seq_out / f"{seq}.txt"
        if seq_out_file.exists():
            continue
        cmd = [args.exe_path, args.vocab_path,
               str(Path(args.settings_path) / f"{day}.yaml"),
               str(Path(args.data_path) / day / seq), str(seq_out_file)]
        print(f"[{i + 1}/{len(sequences)}]", " ".join(cmd))
        subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
