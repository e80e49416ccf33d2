"""Convert RealEstate10K camera .txt files to the pickle format the dataset
loader reads (reference datasets/realestate10k/process_realestate10k.py):
per-sequence {timestamps, intrinsics (n, 6 normalized), poses (n, 3, 4 w2c)}.

The camera files come from the official RealEstate10K release; frames are
extracted separately (see download_realestate10k.py).

Usage:
  python scripts/datasets/process_realestate10k.py -m train -d data/RE10K
"""
from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np


def load_data(mode_path: Path, failures_path: Path):
    seq_files = sorted(mode_path.glob("*.txt"))
    failures = set()
    if failures_path.exists():
        with open(failures_path) as f:
            failures = set(line.strip() for line in f.readlines())

    skipped = 0
    seq_data = {}
    for seq_file in seq_files:
        name = seq_file.stem
        if name in failures:
            skipped += 1
            continue
        rows = np.loadtxt(seq_file, dtype=float, skiprows=1).reshape(-1, 19)
        seq_data[name] = {
            "timestamps": rows[:, 0].astype(np.int64),
            "intrinsics": rows[:, 1:7],
            "poses": rows[:, 7:].reshape(-1, 3, 4),
        }
    print(f"loaded {len(seq_data)} sequences "
          f"(skipped {skipped} failed downloads)")
    return seq_data


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--mode", choices=["train", "test"],
                        required=True)
    parser.add_argument("-d", "--data-path", required=True)
    args = parser.parse_args()
    data_path = Path(args.data_path)
    data = load_data(data_path / args.mode,
                     data_path / f"failed_videos_{args.mode}.txt")
    with open(data_path / f"{args.mode}.pickle", "wb") as f:
        pickle.dump(data, f)
    print("done")


if __name__ == "__main__":
    main()
