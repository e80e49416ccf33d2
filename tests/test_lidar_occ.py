"""End-to-end LiDAR occupancy evaluator test on the miniature KITTI-360
tree with a tiny random network."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from behindthescenes_tpu import renderer as rlib
from behindthescenes_tpu.datasets.kitti_360 import Kitti360Dataset
from behindthescenes_tpu.datasets.synthetic import collate
from behindthescenes_tpu.evaluation.lidar_occ import (LidarOccEvaluator,
                                                      get_pts,
                                                      get_lidar_slices,
                                                      check_occupancy)
from behindthescenes_tpu.models.bts import BTSNet


def test_get_pts_grid():
    pts, (xd, yd, zd) = get_pts((-4, 4), (0, 0.75), (20, 4), 10, 4, 1)
    assert (xd, yd, zd) == (80, 1, 160)
    assert pts.shape == (1, 160, 80, 3)
    # y fixed at the midpoint for y_res=1
    np.testing.assert_allclose(pts[..., 1], 0.375)


def test_occupancy_analytic_wall():
    # One "lidar" at origin seeing a wall at dist 10 in all directions:
    # points closer than 10 are free (visible), farther are occupied.
    angles = np.linspace(-np.pi, np.pi, 361)
    pc = np.stack([np.cos(angles) * 10.0, np.sin(angles) * 10.0,
                   np.zeros_like(angles), np.ones_like(angles)],
                  axis=-1).astype(np.float32)
    # 3 identical timesteps: the occupancy vote threshold (n_t-2)/n_t
    # degenerates for a single timestep (reference semantics).
    velo_poses = np.stack([np.eye(4, dtype=np.float32)] * 3)
    slices = get_lidar_slices([pc] * 3, velo_poses, (0.0, 0.75), 1, 50.0)

    q = np.array([[5.0, 0, 0], [15.0, 0, 0], [0, 0, 5.0], [0, 0, 15.0]],
                 dtype=np.float32)
    occupied, visible = check_occupancy(q, slices, velo_poses)
    assert list(visible) == [True, False, True, False]
    assert list(occupied) == [False, True, False, True]


@pytest.fixture(scope="module")
def kitti360_tree(tmp_path_factory):
    from kitti360_fixture import build_kitti360_tree
    return build_kitti360_tree(tmp_path_factory.mktemp("k360"))


def test_lidar_occ_evaluator_end_to_end(kitti360_tree):
    h, w = 48, 176
    ds = Kitti360Dataset(
        data_path=str(kitti360_tree / "data"),
        pose_path=str(kitti360_tree / "poses"),
        split_path=str(kitti360_tree / "split" / "test_files.txt"),
        target_image_size=(h, w), return_stereo=False,
        return_fisheye=False, frame_count=1)
    batch = collate([ds[0]])

    net = BTSNet(
        z_near=3.0, z_far=80.0,
        encoder_conf={"type": "dummy", "size": (h, w), "d_out": 8},
        code_conf={"num_freqs": 4, "freq_factor": 1.5},
        mlp_coarse_conf={"type": "resnet", "n_blocks": 0, "d_hidden": 16},
        mlp_fine_conf={"type": "empty"},
        learn_empty=False,
    )
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.asarray(batch["imgs"]),
                         jnp.asarray(batch["projs"]),
                         jnp.asarray(batch["poses"]),
                         jnp.zeros((1, 8, 3)))
    cfg = rlib.RendererConfig(n_coarse=8, lindisp=True, hard_alpha_cap=True)
    ev = LidarOccEvaluator(net, cfg, {"z_near": 3.0, "z_far": 80.0,
                                      "query_batch_size": 4096}, ds)
    out = ev.evaluate(variables, batch)
    expected = {"o_acc", "o_prec", "o_rec", "ie_acc", "ie_prec", "ie_rec",
                "ie_r", "t_ie"}
    assert expected <= set(out)
    assert 0.0 <= out["o_acc"] <= 1.0
    assert np.isfinite(out["o_acc"])
