"""KITTI-360 occupancy-benchmark split
(reference datasets/kitti_360/compute_kitti_360_bbox_split.py): derive
train/val/test datapoints from the semantic-annotation frame lists, holding
out every `offset`-th val frame as test and removing the published CUT list
of test indices (frames with degenerate GT; benchmark-defining constant).
"""
from __future__ import annotations

import argparse
from pathlib import Path

# Test indices removed from the benchmark (reference
# compute_kitti_360_bbox_split.py:7-15) — frames with degenerate GT.
CUT = [7, 9, 10, 15, 19, 31, 43, 69, 87, 107, 118, 154, 156, 167, 168, 170,
       171, 172, 173, 174, 178, 179, 180, 181, 182, 183, 184, 185, 187, 188,
       193, 194, 195, 196, 201, 202, 203, 209, 210, 212, 213, 214, 215, 216,
       217, 218, 219, 220, 221, 222, 224, 225, 226, 229, 230, 231, 234, 235,
       236, 237, 238, 256, 257, 258, 267, 278, 283, 293, 294, 295, 296, 297,
       298, 299, 310, 315, 317, 318, 322, 323, 324, 325, 326, 327, 328, 329,
       330, 331, 332, 333, 334, 335, 336, 337, 340, 341, 349, 353, 354, 361,
       362, 365, 366, 368, 371, 372, 376, 380, 386, 387, 394, 402, 403, 404,
       411, 414, 415, 416, 420, 438, 441, 448, 452, 456, 473, 474, 475, 476,
       477, 478, 479, 480, 481, 482, 484, 485, 486, 487, 488, 489, 490, 491,
       492, 493, 494, 495, 496, 497, 498, 499, 519, 520, 554, 562, 593, 594,
       596]


def check_integrity(data_path: Path, seq: str, img_id: int) -> bool:
    persp = data_path / "data_2d_raw" / seq / "image_00" / "data_rect" \
        / f"{img_id:010d}.png"
    fish = data_path / "data_2d_raw" / seq / "image_02" / "data_rgb" \
        / f"{img_id:010d}.png"
    return persp.exists() and fish.exists()


def parse_frame_line(line: str):
    img_path = line.split(" ")[0]
    parts = img_path.split("/")
    return parts[1], int(parts[-1][-14:-4])


def main():
    parser = argparse.ArgumentParser("KITTI-360 bbox/occupancy split")
    parser.add_argument("--data-path", "-d", required=True)
    parser.add_argument("--out-path", "-o", required=True)
    parser.add_argument("--offset", type=int, default=20)
    args = parser.parse_args()

    data_path = Path(args.data_path)
    out_path = Path(args.out_path)
    out_path.mkdir(parents=True, exist_ok=True)

    sem = data_path / "data_2d_semantics" / "train"
    with open(sem / "2013_05_28_drive_train_frames.txt") as f:
        train_lines = f.readlines()
    with open(sem / "2013_05_28_drive_val_frames.txt") as f:
        val_lines = f.readlines()

    train_files, val_files, test_files = [], [], []
    invalid = 0

    for line in train_lines:
        seq, img_id = parse_frame_line(line)
        if not check_integrity(data_path, seq, img_id):
            invalid += 1
            continue
        train_files.append(f"{seq} {img_id:010d} l")
        train_files.append(f"{seq} {img_id:010d} r")

    for i, line in enumerate(val_lines):
        seq, img_id = parse_frame_line(line)
        if not check_integrity(data_path, seq, img_id):
            invalid += 1
            continue
        if i % args.offset == 0:
            test_files.append(f"{seq} {img_id:010d} l")
        else:
            val_files.append(f"{seq} {img_id:010d} l")

    test_files = [s for i, s in enumerate(test_files) if i not in CUT]

    print(f"train={len(train_files)} val={len(val_files)} "
          f"test={len(test_files)} (invalid={invalid}, cut={len(CUT)})")
    for name, files in (("train", train_files), ("val", val_files),
                        ("test", test_files)):
        with open(out_path / f"{name}_files.txt", "w") as f:
            f.write("\n".join(files))


if __name__ == "__main__":
    main()
