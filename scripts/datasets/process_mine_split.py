"""Convert the MINE-paper RealEstate10K evaluation pairs into the loader's
"<sequence-key> <frame-index>" split files
(reference datasets/realestate10k/process_mine_split.py): each JSON-lines
entry names a sequence and a source-frame timestamp; the frame index is
recovered by binary search over the sequence's timestamps in test.pickle.
Entries whose sequence is missing from the pickle are dropped.

Usage:
  python scripts/datasets/process_mine_split.py -d data/RE10K \
      -s path/to/mine_pairs -o datasets/realestate10k/mine_split
"""
from __future__ import annotations

import argparse
import json
import pickle
from pathlib import Path

import numpy as np

SPLIT_FILES = {"val": "validation_pairs.json", "test": "test_pairs.json"}


def resolve_pairs(seq_data: dict, samples: list):
    """-> (["<key> <idx>", ...], n_skipped)."""
    out, skipped = [], 0
    for sample in samples:
        key = sample["sequence_id"]
        if key not in seq_data:
            skipped += 1
            continue
        ts = int(sample["src_img_obj"]["frame_ts"])
        idx = int(np.searchsorted(seq_data[key]["timestamps"], ts))
        out.append(f"{key} {idx}")
    return out, skipped


def main():
    parser = argparse.ArgumentParser("RE10K MINE split conversion")
    parser.add_argument("--data-path", "-d", required=True,
                        help="dir containing test.pickle")
    parser.add_argument("--split-path", "-s", required=True,
                        help="dir containing {validation,test}_pairs.json")
    parser.add_argument("--out-path", "-o", required=True)
    args = parser.parse_args()

    with open(Path(args.data_path) / "test.pickle", "rb") as f:
        seq_data = pickle.load(f)

    out_path = Path(args.out_path)
    out_path.mkdir(parents=True, exist_ok=True)
    for mode, fname in SPLIT_FILES.items():
        with open(Path(args.split_path) / fname) as f:
            samples = [json.loads(ln) for ln in f if ln.strip()]
        lines, skipped = resolve_pairs(seq_data, samples)
        with open(out_path / f"{mode}_files.txt", "w") as f:
            f.write("\n".join(lines))
        print(f"{mode}: {len(lines)} datapoints ({skipped} skipped)")


if __name__ == "__main__":
    main()
