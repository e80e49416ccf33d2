"""Depth + profile images for dataset samples
(reference scripts/images/gen_imgs.py:17-108).

Usage:
  python scripts/images/gen_imgs.py -cn exp_synthetic --indices 0 1 2 \
      [--checkpoint ...] [--out out/gen_imgs]
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
from behindthescenes_tpu.utils.io import write_image
from behindthescenes_tpu.utils.plotting import color_tensor


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-cn", "--config-name", default="exp_synthetic")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--indices", type=int, nargs="+", default=[0])
    parser.add_argument("--out", default="out/gen_imgs")
    args = parser.parse_args()

    model_key = args.config_name.replace("exp_", "")
    net, variables, rcfg, config = iset.setup_model(
        model_key, args.checkpoint, config_name=args.config_name)
    z_near = config["model_conf"]["z_near"]
    z_far = config["model_conf"]["z_far"]

    ds = make_test_dataset(config["data"])
    os.makedirs(args.out, exist_ok=True)

    for idx in args.indices:
        item = ds[idx]
        images = jnp.asarray(item["imgs"][None])
        poses = jnp.asarray(item["poses"][None])
        projs = jnp.asarray(item["projs"][None])
        h, w = images.shape[2:4]
        grid = net.apply(variables, images, projs, poses, ids_encoder=[0],
                         ids_render=[0], method=BTSNet.encode)
        depth = iset.render_depth(net, variables, grid, rcfg, h, w, z_near,
                                  z_far)
        profile, _ = iset.render_profile(net, variables, grid)

        write_image(os.path.join(args.out, f"{idx:06d}_in.png"),
                    np.asarray(item["imgs"][0]) * 0.5 + 0.5)
        write_image(os.path.join(args.out, f"{idx:06d}_depth.png"),
                    iset.depth_to_colormap(depth, z_near, z_far))
        write_image(os.path.join(args.out, f"{idx:06d}_profile.png"),
                    color_tensor(profile, "magma"))
        print(f"[{idx}] depth {depth.min():.2f}..{depth.max():.2f} m")


if __name__ == "__main__":
    main()
