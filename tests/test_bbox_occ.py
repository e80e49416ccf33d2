"""3D-bbox occupancy evaluator: geometry unit tests + end-to-end run."""
import jax
import jax.numpy as jnp
import numpy as np

from behindthescenes_tpu import renderer as rlib
from behindthescenes_tpu.evaluation.bbox_occ import (BBoxOccEvaluator,
                                                     bbox_in_frustum,
                                                     bbox_intercept_labeled,
                                                     compute_bounds, in_bbox)
from behindthescenes_tpu.models.bts import BTSNet


def _unit_cube(center, size=1.0):
    c = np.asarray(center, dtype=np.float32)
    s = size / 2
    verts = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                      for z in (-s, s)], dtype=np.float32) + c
    # 12 triangles of a cube
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], dtype=np.int64)
    return {"vertices": verts, "faces": faces, "semanticId": 26,
            "instanceId": 1}


def test_in_bbox_cube():
    bbox = _unit_cube([0, 0, 5], 2.0)
    fnb = compute_bounds(bbox)
    pts = np.array([[0, 0, 5], [0.9, 0.9, 5.9], [1.2, 0, 5], [0, 0, 7]],
                   dtype=np.float32)
    got = in_bbox(pts, fnb)
    assert list(got) == [True, True, False, False]


def test_bbox_in_frustum():
    k = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    assert bbox_in_frustum(_unit_cube([0, 0, 5]), k, 20.0)
    assert not bbox_in_frustum(_unit_cube([0, 0, -5]), k, 20.0)
    assert not bbox_in_frustum(_unit_cube([50, 0, 5]), k, 20.0)


def test_bbox_intercept_labeled_center_ray():
    bbox = _unit_cube([0, 0, 5], 2.0)
    fnb = compute_bounds(bbox)
    dirs = np.array([[0, 0, 1.0], [1.0, 0, 0.0]], dtype=np.float32)
    labels = np.array([26, 26])
    pts = bbox_intercept_labeled(dirs, labels, fnb, 26)
    # Center ray enters the cube at z=4.
    np.testing.assert_allclose(pts[0], [0, 0, 4.0], atol=1e-5)
    assert np.isinf(pts[1]).all()   # sideways ray misses
    # Wrong label -> no intercept.
    pts2 = bbox_intercept_labeled(dirs, np.array([7, 7]), fnb, 26)
    assert np.isinf(pts2).all()


def test_bbox_evaluator_end_to_end():
    h, w = 32, 48
    rng = np.random.default_rng(0)
    batch = {
        "imgs": rng.uniform(-1, 1, (1, 1, h, w, 3)).astype(np.float32),
        "poses": np.broadcast_to(np.eye(4, dtype=np.float32),
                                 (1, 1, 4, 4)).copy(),
        "projs": np.broadcast_to(np.array(
            [[0.7, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], dtype=np.float32),
            (1, 1, 3, 3)).copy(),
        "3d_bboxes": [_unit_cube([0, 0.5, 8], 2.0),
                      _unit_cube([-2, 0.5, 12], 3.0)],
        "segs": np.full((1, h, w), 26, dtype=np.int32),
    }
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
    ev = BBoxOccEvaluator(net, cfg, {"z_near": 3.0, "z_far": 80.0,
                                     "query_batch_size": 4096}, None)
    out = ev.evaluate(variables, batch)
    assert {"o_acc", "ie_acc", "t_ie"} <= set(out)
    assert 0.0 <= out["o_acc"] <= 1.0


def test_bbox_evaluator_through_dataset_and_collate(tmp_path):
    """Regression: the full eval_3dbb dataflow — Kitti360Dataset with
    return_3d_bboxes/return_segmentation -> collate -> evaluator. collate
    once np.stack'ed the ragged per-sample bbox dict lists into object
    arrays, crashing the evaluator's b[\"semanticId\"] filter."""
    import sys
    sys.path.insert(0, "tests")
    from kitti360_fixture import (build_kitti360_tree,
                                  add_bboxes_and_semantics)
    from behindthescenes_tpu.datasets.kitti_360 import Kitti360Dataset
    from behindthescenes_tpu.datasets.synthetic import collate

    tree = build_kitti360_tree(tmp_path / "k360")
    add_bboxes_and_semantics(tree)
    h, w = 48, 176
    ds = Kitti360Dataset(
        data_path=str(tree / "data"), pose_path=str(tree / "poses"),
        split_path=str(tree / "split" / "test_files.txt"),
        target_image_size=(h, w), return_stereo=False, return_fisheye=False,
        frame_count=1, return_3d_bboxes=True, return_segmentation=True)
    batch = collate([ds[0]])
    assert isinstance(batch["3d_bboxes"], list)          # ragged passthrough
    assert isinstance(batch["3d_bboxes"][0][0], dict)
    assert batch["segs"].shape == (1, 1, h, w)

    net = BTSNet(
        z_near=3.0, z_far=80.0,
        encoder_conf={"type": "dummy", "size": (h, w), "d_out": 8},
        code_conf={"num_freqs": 4, "freq_factor": 1.5},
        mlp_coarse_conf={"type": "resnet", "n_blocks": 0, "d_hidden": 16},
        mlp_fine_conf={"type": "empty"},
        learn_empty=False,
    )
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(batch["imgs"]),
                         jnp.asarray(batch["projs"]),
                         jnp.asarray(batch["poses"]), jnp.zeros((1, 8, 3)))
    cfg = rlib.RendererConfig(n_coarse=8, lindisp=True, hard_alpha_cap=True)
    ev = BBoxOccEvaluator(net, cfg, {"z_near": 3.0, "z_far": 80.0,
                                     "query_batch_size": 4096}, ds)
    out = ev.evaluate(variables, batch)
    assert {"o_acc", "ie_acc", "t_ie"} <= set(out)
    assert np.isfinite(out["o_acc"])
