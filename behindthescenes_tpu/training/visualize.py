"""Training visualization grids (reference models/bts/trainer.py:430-506):
input images, reconstructions, depth maps, density profiles, ray entropy,
alpha sums, invalid masks — written to TensorBoard.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from behindthescenes_tpu.parallel.mesh import shard_batch
from behindthescenes_tpu.utils.plotting import color_tensor, make_grid


def build_visualization_images(data: dict, z_near: float,
                               z_far: float) -> dict:
    """data: a reconstructed eval render dict (coarse/fine lists with shapes
    (n, v, h, w, ...)). Returns {name: (h', w', 3) numpy image}."""
    images = np.asarray(data["imgs"])[0]                 # (v, h, w, 3)
    fine_0 = data["fine"][0]
    coarse_0 = data["coarse"][0]
    recon_imgs = np.asarray(fine_0["rgb"])[0]            # (v, h, w, vr, 3)
    recon_depths = [np.asarray(f["depth"])[0] for f in data["fine"]]
    alphas = np.asarray(coarse_0["alphas"])[0]           # (v, h, w, K)
    invalids = np.asarray(coarse_0["invalid"])[0]        # (v, h, w, K, vr)

    take_n = min(images.shape[0], 6)
    nrow = int(take_n ** 0.5)

    imgs01 = images[:take_n] * 0.5 + 0.5
    recon = recon_imgs[:take_n].mean(-2)
    recon_mse = np.clip(((imgs01 - np.clip(recon, 0, 1)) ** 2 / 2)
                        .mean(-1), 0, 1)

    out = {
        "input_im": make_grid(imgs01, nrow),
        "recon_im": make_grid(np.clip(recon, 0, 1), nrow),
        "recon_mse": make_grid(color_tensor(recon_mse, "plasma"), nrow),
    }

    for i, d in enumerate(recon_depths):
        dn = (1 / np.clip(d[:take_n], 1e-6, None) - 1 / z_far) \
            / (1 / z_near - 1 / z_far)
        out[f"recon_depth_{i}"] = make_grid(
            color_tensor(np.clip(dn, 0, 1), "plasma"), nrow)

    # Horizontal density-profile slices at 1/4, 1/2, 3/4 image height.
    h = alphas.shape[1]
    prof = alphas[:take_n][:, [h // 4, h // 2, 3 * h // 4]]
    prof = prof.reshape(take_n * 3, prof.shape[2], -1).transpose(0, 2, 1)
    prof = np.clip(prof, 0, None) / max(prof.max(), 1e-6)
    out["depth_profile"] = make_grid(color_tensor(prof, "plasma"), nrow)

    al = alphas[:take_n] + 1e-5
    ray_density = al / al.sum(-1, keepdims=True)
    ray_entropy = -(ray_density * np.log(ray_density)).sum(-1) \
        / math.log2(al.shape[-1])
    out["ray_entropy"] = make_grid(color_tensor(ray_entropy, "plasma"), nrow)

    alpha_sum = np.clip(al.sum(-1) / al.shape[-1], 0, 1)
    out["alpha_sum"] = make_grid(color_tensor(alpha_sum, "plasma"), nrow)

    inv = invalids[:take_n].mean(-1).mean(-1)
    out["invalids"] = make_grid(color_tensor(inv, "plasma"), nrow)
    return out


def make_tb_visualizer(writer):
    """Returns a visualize(trainer, state, vis_loader, step) callback for
    base_training that writes image grids to a TensorBoard writer."""

    def visualize(trainer, state, vis_loader, step):
        batch = next(iter(vis_loader))
        batch = shard_batch(batch, trainer.mesh)
        key = jax.random.PRNGKey(step)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        v = batch["imgs"].shape[1]
        ids = trainer.wrapper.select_views(trainer.np_rng, v, training=False)
        data, _ = trainer.wrapper.forward(variables, batch, key, ids,
                                          train=False)
        data = dict(data)
        data["imgs"] = batch["imgs"]
        grids = build_visualization_images(
            data, trainer.wrapper.z_near, trainer.wrapper.z_far)
        for name, img in grids.items():
            writer.add_image(f"vis/{name}", img, global_step=step,
                             dataformats="HWC")
        writer.flush()

    return visualize
