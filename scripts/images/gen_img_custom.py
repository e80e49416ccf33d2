"""Headline demo (reference scripts/images/gen_img_custom.py:19-162):
single custom image -> expected-depth map + top-down BEV density profile.

Usage:
  python scripts/images/gen_img_custom.py --img media/example/0000.png \
      --model kitti_raw [--checkpoint path/to/training_XXX.pt] [--out out/]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np

import inference_setup as iset
from behindthescenes_tpu.utils.io import read_image, write_image


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--img", required=True)
    parser.add_argument("--model", default="kitti_raw",
                        choices=list(iset.DEFAULT_RESOLUTION))
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--out", default="out/gen_img")
    parser.add_argument("--plot", action="store_true",
                        help="show matplotlib figures instead of saving")
    args = parser.parse_args()

    net, variables, rcfg, config = iset.setup_model(args.model,
                                                    args.checkpoint)
    z_near = config["model_conf"]["z_near"]
    z_far = config["model_conf"]["z_far"]
    h, w = iset.DEFAULT_RESOLUTION[args.model]
    fx, fy = iset.DEFAULT_INTRINSICS[args.model]

    import cv2
    img = read_image(args.img)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)

    grid, projs, poses = iset.encode_image(net, variables, img, fx, fy)
    depth = iset.render_depth(net, variables, grid, rcfg, h, w, z_near,
                              z_far)
    profile, _ = iset.render_profile(net, variables, grid)

    depth_img = iset.depth_to_colormap(depth, z_near, z_far)
    name = os.path.splitext(os.path.basename(args.img))[0]

    if args.plot:
        import matplotlib.pyplot as plt
        for im, title in ((img, "input"), (depth_img, "depth"),
                          (profile, "profile")):
            plt.figure()
            plt.imshow(im)
            plt.title(title)
        plt.show()
    else:
        os.makedirs(args.out, exist_ok=True)
        write_image(os.path.join(args.out, f"{name}_in.png"), img)
        write_image(os.path.join(args.out, f"{name}_depth.png"), depth_img)
        from behindthescenes_tpu.utils.plotting import color_tensor
        write_image(os.path.join(args.out, f"{name}_profile.png"),
                    color_tensor(profile, "magma"))
        print(f"depth range: {depth.min():.2f}..{depth.max():.2f} m")
        print(f"wrote {args.out}/{name}_{{in,depth,profile}}.png")


if __name__ == "__main__":
    main()
