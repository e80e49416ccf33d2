"""Shared inference setup for the media scripts
(reference scripts/inference_setup.py:100-229): per-model config +
checkpoint loading, full-frame depth rendering, BEV density profiles.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from behindthescenes_tpu.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from behindthescenes_tpu import inference, renderer as renderer_lib
from behindthescenes_tpu.config import find_config, load_config
from behindthescenes_tpu.evaluation.harness import load_eval_variables
from behindthescenes_tpu.models.bts import BTSNet

# Default NDC intrinsics per pretrained model family
# (reference gen_img_custom.py:54-95).
DEFAULT_INTRINSICS = {
    "kitti_raw": (0.9185, 2.9477),     # fx, fy for 192x640 KITTI crop
    "kitti_360": (0.7849, 2.9477),
    "re10k": (1.5, 2.25),
    "synthetic": (1.2, 1.6),           # datasets/synthetic.py:103
}

DEFAULT_RESOLUTION = {
    "kitti_raw": (192, 640),
    "kitti_360": (192, 640),
    "re10k": (256, 384),
    "synthetic": (48, 64),             # CI-sized demo/smoke-test family
}


def setup_model(model_name: str, checkpoint: str | None = None,
                config_name: str | None = None):
    """-> (net, variables, renderer_cfg, config)."""
    config_name = config_name or f"exp_{model_name}"
    config = load_config(find_config(
        config_name, search_dirs=(
            "configs",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "configs"))))
    if checkpoint:
        config["checkpoint"] = checkpoint
    net = BTSNet.from_conf(config["model_conf"],
                           compute_dtype=jnp.bfloat16)
    rcfg = renderer_lib.RendererConfig.from_conf(config.get("renderer", {}))

    h, w = DEFAULT_RESOLUTION.get(model_name, (192, 640))
    sample_batch = {
        "imgs": np.zeros((1, 1, h, w, 3), dtype=np.float32),
        "poses": np.eye(4, dtype=np.float32)[None, None],
        "projs": np.eye(3, dtype=np.float32)[None, None],
    }
    variables = load_eval_variables(config, net, sample_batch)
    return net, variables, rcfg, config


def encode_image(net, variables, img_np, fx, fy):
    """img_np: (h, w, 3) in [0, 1]. Returns (grid, projs, poses)."""
    h, w = img_np.shape[:2]
    images = jnp.asarray(img_np[None, None] * 2.0 - 1.0, dtype=jnp.float32)
    poses = jnp.eye(4)[None, None]
    projs = jnp.asarray(
        [[fx, 0, 0], [0, fy, 0], [0, 0, 1.0]],
        dtype=jnp.float32)[None, None]
    grid = net.apply(variables, images, projs, poses, ids_encoder=[0],
                     ids_render=[0], method=BTSNet.encode)
    return grid, projs, poses


def render_depth(net, variables, grid, rcfg, h, w, z_near, z_far, seed=0):
    depth, _, _ = inference.render_depth_selfview(
        net, variables, grid, jax.random.PRNGKey(seed), h, w, rcfg,
        z_near, z_far)
    return np.asarray(depth)[0]


def render_profile(net, variables, grid, **kwargs):
    profile, sigma = inference.render_profile(net, variables, grid, **kwargs)
    return np.asarray(profile), np.asarray(sigma)


def depth_to_colormap(depth, z_near, z_far, cmap="magma"):
    from behindthescenes_tpu.utils.plotting import color_tensor
    inv = (1 / np.clip(depth, 1e-6, None) - 1 / z_far) \
        / (1 / z_near - 1 / z_far)
    return color_tensor(np.clip(inv, 0, 1), cmap)
