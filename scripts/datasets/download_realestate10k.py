"""Download RealEstate10K videos and extract the annotated frames
(reference datasets/realestate10k/download_realestate10k.py): for every
camera .txt, fetch the YouTube video (yt-dlp) and cut the frames listed by
timestamp (microseconds) with ffmpeg into frames/<split>/<seq>/<ts>.jpg.
Failed downloads are recorded in failed_videos_<split>.txt so
process_realestate10k.py can skip them.

Requires `yt-dlp` and `ffmpeg` on PATH (external tools; not part of the
framework runtime).

Usage:
  python scripts/datasets/download_realestate10k.py -m train -d data/RE10K
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import tempfile
from pathlib import Path

import numpy as np


def extract_frames(video_path: str, timestamps, out_dir: Path):
    out_dir.mkdir(parents=True, exist_ok=True)
    for ts in timestamps:
        out = out_dir / f"{ts}.jpg"
        if out.exists():
            continue
        seconds = ts / 1_000_000.0
        subprocess.run(
            ["ffmpeg", "-loglevel", "error", "-y", "-ss", f"{seconds:.6f}",
             "-i", video_path, "-frames:v", "1", "-q:v", "2", str(out)],
            check=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--mode", choices=["train", "test"],
                        required=True)
    parser.add_argument("-d", "--data-path", required=True)
    args = parser.parse_args()

    if shutil.which("yt-dlp") is None or shutil.which("ffmpeg") is None:
        raise SystemExit("yt-dlp and ffmpeg must be on PATH")

    data_path = Path(args.data_path)
    mode_path = data_path / args.mode
    frames_root = data_path / "frames" / args.mode
    failures_file = data_path / f"failed_videos_{args.mode}.txt"
    failures = set()
    if failures_file.exists():
        failures = set(failures_file.read_text().split())

    for seq_file in sorted(mode_path.glob("*.txt")):
        name = seq_file.stem
        if name in failures or (frames_root / name).exists():
            continue
        with open(seq_file) as f:
            url = f.readline().strip()
        rows = np.loadtxt(seq_file, dtype=float, skiprows=1).reshape(-1, 19)
        timestamps = rows[:, 0].astype(np.int64)

        with tempfile.TemporaryDirectory() as tmp:
            video = os.path.join(tmp, "video.mp4")
            try:
                subprocess.run(
                    ["yt-dlp", "-f", "bestvideo[height<=720][ext=mp4]",
                     "-o", video, url], check=True)
                extract_frames(video, timestamps, frames_root / name)
                print(f"{name}: {len(timestamps)} frames")
            except subprocess.CalledProcessError:
                print(f"{name}: FAILED")
                failures.add(name)
                with open(failures_file, "w") as f:
                    f.write("\n".join(sorted(failures)) + "\n")


if __name__ == "__main__":
    main()
