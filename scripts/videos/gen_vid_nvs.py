"""Novel-view flythrough along a saved camera trajectory
(reference scripts/videos/gen_vid_nvs.py:80-135): encode one frame, render
the scene from trajectory poses (.npy of (n, 4, 4) c2w matrices, e.g.
exported from Blender via scripts/blender/export_camera_trj.py).

Usage:
  python scripts/videos/gen_vid_nvs.py -cn exp_synthetic --index 0 \
      --trajectory scripts/videos/trajectories/traj.npy \
      [--checkpoint ...] [--out out/videos/nvs.mp4]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

import inference_setup as iset
from behindthescenes_tpu import inference
from behindthescenes_tpu.datasets.factory import make_test_dataset
from behindthescenes_tpu.models.bts import BTSNet
from behindthescenes_tpu.utils.io import write_video


def default_trajectory(n=60, radius=0.5, forward=4.0):
    """Fallback: a gentle S-curve forward sweep."""
    ts = np.linspace(0, 1, n)
    poses = []
    for t in ts:
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = radius * np.sin(2 * np.pi * t)
        pose[2, 3] = forward * t
        poses.append(pose)
    return np.stack(poses)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-cn", "--config-name", default="exp_synthetic")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--index", type=int, default=0)
    parser.add_argument("--trajectory", default=None)
    parser.add_argument("--fps", type=int, default=15)
    parser.add_argument("--out", default="out/videos/nvs.mp4")
    args = parser.parse_args()

    model_key = args.config_name.replace("exp_", "")
    net, variables, rcfg, config = iset.setup_model(
        model_key, args.checkpoint, config_name=args.config_name)
    z_near = config["model_conf"]["z_near"]
    z_far = config["model_conf"]["z_far"]
    ds = make_test_dataset(config["data"])
    item = ds[args.index]

    images = jnp.asarray(item["imgs"][None])
    poses = jnp.asarray(item["poses"][None])
    projs = jnp.asarray(item["projs"][None])
    h, w = images.shape[2:4]

    # Rebase so the keyframe is the origin; trajectory poses are relative.
    from behindthescenes_tpu import geometry
    poses_r = geometry.rebase_poses_to_keyframe(poses)
    grid = net.apply(variables, images, projs, poses_r, ids_encoder=[0],
                     ids_render=[0], method=BTSNet.encode)

    if args.trajectory:
        traj = np.load(args.trajectory).astype(np.float32)
    else:
        traj = default_trajectory()

    frames = []
    for i in range(0, len(traj), 1):
        out = inference.render_poses(
            net, variables, grid, jax.random.PRNGKey(i),
            jnp.asarray(traj[i:i + 1]), projs[0, :1], h, w, rcfg,
            z_near, z_far)
        rgb = np.clip(np.asarray(out["rgb"])[0], 0, 1)
        depth_img = iset.depth_to_colormap(np.asarray(out["depth"])[0],
                                           z_near, z_far)
        frames.append(np.concatenate([rgb, depth_img], axis=1))
        print(f"pose {i + 1}/{len(traj)}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    write_video(args.out, frames, fps=args.fps)
    print(f"wrote {args.out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
