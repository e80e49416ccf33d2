"""Camera sweep animation from the input view down to a top-down view
(reference scripts/videos/gen_vid_transition.py:22-186): interpolate between
the keyframe camera and a bird's-eye pose while blending rendered RGB and
depth.

Usage:
  python scripts/videos/gen_vid_transition.py -cn exp_synthetic --index 0 \
      [--checkpoint ...] [--out out/videos/transition.mp4]
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
from scipy.spatial.transform import Rotation, Slerp

import inference_setup as iset
from behindthescenes_tpu import geometry, inference
from behindthescenes_tpu.datasets.factory import make_test_dataset
from behindthescenes_tpu.models.bts import BTSNet
from behindthescenes_tpu.utils.io import write_video


def interpolate_poses(pose_a, pose_b, n):
    """Slerp rotation + lerp translation between two c2w poses."""
    rots = Rotation.from_matrix(np.stack([pose_a[:3, :3], pose_b[:3, :3]]))
    slerp = Slerp([0, 1], rots)
    ts = np.linspace(0, 1, n)
    out = []
    for t in ts:
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = slerp(t).as_matrix()
        pose[:3, 3] = (1 - t) * pose_a[:3, 3] + t * pose_b[:3, 3]
        out.append(pose)
    return np.stack(out)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-cn", "--config-name", default="exp_synthetic")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--index", type=int, default=0)
    parser.add_argument("--n-frames", type=int, default=40)
    parser.add_argument("--height", type=float, default=8.0)
    parser.add_argument("--forward", type=float, default=10.0)
    parser.add_argument("--fps", type=int, default=15)
    parser.add_argument("--out", default="out/videos/transition.mp4")
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
    poses_r = geometry.rebase_poses_to_keyframe(poses)
    grid = net.apply(variables, images, projs, poses_r, ids_encoder=[0],
                     ids_render=[0], method=BTSNet.encode)

    # Top-down pose looking at the scene center from above.
    topdown = geometry.look_at(
        origin=[0.0, -args.height, args.forward * 0.3],
        target=[0.0, 0.0, args.forward * 0.6], world_up=[0, 0, 1])
    traj = interpolate_poses(np.eye(4, dtype=np.float32), topdown,
                             args.n_frames)

    frames = []
    for i, pose in enumerate(traj):
        out = inference.render_poses(
            net, variables, grid, jax.random.PRNGKey(i),
            jnp.asarray(pose[None]), projs[0, :1], h, w, rcfg, z_near,
            z_far)
        rgb = np.clip(np.asarray(out["rgb"])[0], 0, 1)
        invalid = np.asarray(out["invalid"])[0][..., None]
        rgb = rgb * (1 - invalid) + 0.5 * invalid  # grey-out invalids
        frames.append(rgb)
        print(f"pose {i + 1}/{len(traj)}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    write_video(args.out, frames, fps=args.fps)
    print(f"wrote {args.out} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
