#!/bin/bash
# Fetch the published BehindTheScenes checkpoints (torch .pt). They load
# directly into this framework via behindthescenes_tpu.import_torch
# (eval.py ... checkpoint=out/<model>/pretrained/training-checkpoint.pt).
set -e

model=$1

case "$model" in
  kitti-360)
    cp_link="https://cvg.cit.tum.de/webshare/g/behindthescenes/kitti-360/training-checkpoint.pt"
    cp_download_path="out/kitti_360/pretrained/training-checkpoint.pt"
    ;;
  kitti-raw)
    cp_link="https://cvg.cit.tum.de/webshare/g/behindthescenes/kitti/training-checkpoint.pt"
    cp_download_path="out/kitti_raw/pretrained/training-checkpoint.pt"
    ;;
  *)
    echo "Usage: $0 {kitti-360|kitti-raw}"
    exit 1
    ;;
esac

cd "$(dirname "$0")"
mkdir -p "$(dirname "$cp_download_path")"
echo "Downloading $cp_link -> $cp_download_path"
wget -O "$cp_download_path" "$cp_link"
