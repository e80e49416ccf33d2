"""Depth/profile video over a dataset sequence range
(reference scripts/videos/gen_vid_seq.py:21-150).

Usage:
  python scripts/videos/gen_vid_seq.py -cn exp_synthetic --from-idx 0 \
      --to-idx 16 [--checkpoint ...] [--out out/videos/seq.mp4]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax.numpy as jnp
import numpy as np

import inference_setup as iset
from behindthescenes_tpu.datasets.factory import make_test_dataset
from behindthescenes_tpu.models.bts import BTSNet
from behindthescenes_tpu.utils.io import write_video
from behindthescenes_tpu.utils.plotting import color_tensor


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-cn", "--config-name", default="exp_synthetic")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--from-idx", type=int, default=0)
    parser.add_argument("--to-idx", type=int, default=16)
    parser.add_argument("--fps", type=int, default=10)
    parser.add_argument("--out", default="out/videos/seq.mp4")
    args = parser.parse_args()

    model_key = args.config_name.replace("exp_", "")
    net, variables, rcfg, config = iset.setup_model(
        model_key, args.checkpoint, config_name=args.config_name)
    z_near = config["model_conf"]["z_near"]
    z_far = config["model_conf"]["z_far"]
    ds = make_test_dataset(config["data"])

    frames = []
    for idx in range(args.from_idx, min(args.to_idx, len(ds))):
        item = ds[idx]
        images = jnp.asarray(item["imgs"][None])
        poses = jnp.asarray(item["poses"][None])
        projs = jnp.asarray(item["projs"][None])
        h, w = images.shape[2:4]
        grid = net.apply(variables, images, projs, poses, ids_encoder=[0],
                         ids_render=[0], method=BTSNet.encode)
        depth = iset.render_depth(net, variables, grid, rcfg, h, w, z_near,
                                  z_far, seed=idx)
        profile, _ = iset.render_profile(net, variables, grid)

        rgb = np.asarray(item["imgs"][0]) * 0.5 + 0.5
        depth_img = iset.depth_to_colormap(depth, z_near, z_far)
        prof_img = color_tensor(profile, "magma")
        import cv2
        prof_img = cv2.resize(prof_img, (w, h))
        frames.append(np.concatenate([rgb, depth_img, prof_img], axis=1))
        print(f"frame {idx}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    write_video(args.out, frames, fps=args.fps)
    print(f"wrote {args.out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
