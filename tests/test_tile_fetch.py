"""Tile-region feature fetch (ops/grid_sample.grid_sample_2d_tiles) wired
into patch-mode training: the train step must produce the same loss and
gradients as the gather path whenever every tile fits its region (the op
is exactly border-bilinear there; measured 6x faster than the x-pair row
gathers on chip — scripts/bench_strip_fetch.py, PERF.md).
"""
import jax
import jax.numpy as jnp
import numpy as np

from behindthescenes_tpu.datasets.factory import make_datasets
from behindthescenes_tpu.datasets.synthetic import collate
from behindthescenes_tpu.parallel.mesh import make_mesh
from behindthescenes_tpu.training.trainer import BTSTrainer


def _config(tile_region=None):
    mc = {
        "arch": "BTSNet", "z_near": 1.0, "z_far": 40.0, "inv_z": True,
        "learn_empty": False,
        "encoder": {"type": "monodepth2", "resnet_layers": 18,
                    "num_ch_dec": (8, 8, 16, 16, 32), "d_out": 8,
                    "scales": (0,)},
        "code": {"num_freqs": 6, "freq_factor": 1.5, "include_input": True},
        "mlp_coarse": {"type": "resnet", "n_blocks": 0, "d_hidden": 16},
        "mlp_fine": {"type": "empty"},
        "n_frames_render": 2, "frame_sample_mode": "default",
        "sample_mode": "patch", "patch_size": 4, "ray_batch_size": 128,
        "prediction_mode": "default", "flip_augmentation": False,
    }
    if tile_region is not None:
        mc["tile_fetch_region"] = list(tile_region)
    return {
        "seed": 0, "bf16": False, "learning_rate": 1e-4,
        "model_conf": mc,
        "loss": {"criterion": "l1+ssim", "invalid_policy": "weight_guided"},
        "renderer": {"n_coarse": 12, "lindisp": True,
                     "hard_alpha_cap": True},
        "scheduler": {"type": "fix"},
    }


def test_tile_fetch_train_step_matches_gather():
    # TRAIN split: 4 views/sample (stereo x fc) so the default
    # frame-sample mode has loss views left over after the 2 render views.
    ds, _ = make_datasets({"type": "Synthetic", "image_size": (48, 64),
                           "data_fc": 2, "length": 8})
    batch = {k: jnp.asarray(v) for k, v in collate([ds[0], ds[1]]).items()}
    key = jax.random.PRNGKey(7)

    losses, grads = [], []
    for region in (None, (40, 56)):
        trainer = BTSTrainer(_config(region), mesh=make_mesh(
            jax.devices()[:1]))
        assert (trainer.wrapper.query_tiles is not None) == (
            region is not None)
        state = trainer.init_state(batch, jax.random.PRNGKey(0))
        ids = trainer.wrapper.select_views(
            np.random.default_rng(0), int(batch["imgs"].shape[1]),
            training=True)
        step = trainer._build_train_step(trainer.scheduler.step())
        new_state, out = step(state, batch, key, ids, jnp.asarray(1.0))
        losses.append(float(out["loss"]))
        grads.append(np.asarray(
            new_state.params["mlp_coarse"]["lin_in"]["kernel"]))

    # A (40, 56) region over the 48x64 feature map always fits any tile,
    # so the tile path must reproduce the gather path's training step up
    # to float reassociation (same loss, same updated params).
    assert abs(losses[0] - losses[1]) < 1e-5, losses
    np.testing.assert_allclose(grads[1], grads[0], atol=1e-5)
