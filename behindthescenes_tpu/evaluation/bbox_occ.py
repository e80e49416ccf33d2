"""KITTI-360 3D-bounding-box occupancy evaluator
(reference models/bts/evaluator_3dbb.py:30-330).

Ground-truth occupancy comes from semantic 3D bounding boxes: vertices are
moved into the keyframe camera frame, frustum-filtered, and represented by
face-normal slab bounds (min/max projections per face normal). Visibility is
derived from a per-pixel label-aware ray/box intercept pseudo-depth plus the
model's own rendered depth. All geometry is host-side numpy; only density
queries run on device.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from behindthescenes_tpu.datasets.kitti_360_labels import id2label
from behindthescenes_tpu.evaluation.lidar_occ import (
    _grid_sample_nearest_ac_true)
from behindthescenes_tpu.inference import render_depth_selfview
from behindthescenes_tpu.models.bts import BTSNet

EPS = 1e-4


def verts_to_cam(bbox, pose_w2c):
    verts = np.asarray(bbox["vertices"], dtype=np.float32)
    verts = (pose_w2c[:3, :3] @ verts.T + pose_w2c[:3, 3, None]).T
    out = dict(bbox)
    out["vertices"] = verts
    out["faces"] = np.asarray(bbox["faces"], dtype=np.int64)
    return out


def bbox_in_frustum(bbox, projs, max_d, reducer=np.any):
    """(reference evaluator_3dbb.py:38-44)."""
    verts = (projs @ bbox["vertices"].T).T.copy()
    verts[:, :2] /= verts[:, 2:3]
    valid = (((verts[:, 0] >= -1) & (verts[:, 0] <= 1))
             & ((verts[:, 1] >= -1) & (verts[:, 1] <= 1))
             & ((verts[:, 2] > 0) & (verts[:, 2] <= max_d)))
    return bool(reducer(valid))


def compute_bounds(bbox):
    """Face-normal slab bounds (reference evaluator_3dbb.py:47-60).
    Returns (m, 5): [normal(3), min_proj, max_proj]."""
    vertices = bbox["vertices"]
    faces = bbox["faces"]
    v0 = vertices[faces[:, 0]]
    normals = np.cross(vertices[faces[:, 1]] - v0, vertices[faces[:, 2]] - v0)
    normals = normals / np.linalg.norm(normals, axis=-1, keepdims=True)
    projections = normals @ vertices.T
    return np.concatenate([normals,
                           projections.min(-1, keepdims=True),
                           projections.max(-1, keepdims=True)], axis=-1)


def in_bbox(pts, fnbs):
    """Point-in-convex-polytope via slab bounds
    (reference evaluator_3dbb.py:63-74)."""
    projections = fnbs[:, :3] @ pts.T
    is_in = ((fnbs[:, 3:4] - EPS <= projections)
             & (projections <= fnbs[:, 4:5] + EPS))
    return np.all(is_in, axis=0)


def bbox_intercept_labeled(dirs, labels_px, fnbs, box_label):
    """Per-ray nearest intercept with one labeled box
    (reference evaluator_3dbb.py:102-128). Camera-space rays from origin.
    """
    n = dirs.shape[0]
    m = fnbs.shape[0]
    denom = fnbs[:, :3] @ dirs.T                      # (m, n)
    with np.errstate(divide="ignore", invalid="ignore"):
        i1 = (fnbs[:, 3:4] / denom).T[..., None] * dirs[:, None, :]
        i2 = (fnbs[:, 4:5] / denom).T[..., None] * dirs[:, None, :]
    pts = np.concatenate([i1, i2], axis=1).reshape(-1, 3)  # (n*2m, 3)
    is_in = in_bbox(pts, fnbs) & (pts[:, 2] > 0)
    is_label = np.repeat(labels_px.reshape(n, 1) == box_label, 2 * m,
                         axis=1).reshape(-1)
    pts[~(is_in & is_label)] = np.inf
    pts = pts.reshape(n, 2 * m, 3)
    best = np.argmin(pts[:, :, 2], axis=1)
    return pts[np.arange(n), best]


def get_pts(x_range, y_range, z_range, ppm, ppm_y):
    """Query grid with the 5-degree inclination shear
    (reference evaluator_3dbb.py:131-143)."""
    x_res = abs(int((x_range[1] - x_range[0]) * ppm))
    y_res = abs(int((y_range[1] - y_range[0]) * ppm_y))
    z_res = abs(int((z_range[1] - z_range[0]) * ppm))
    x = np.linspace(x_range[0], x_range[1], x_res)[None, None] \
        .repeat(z_res, 1).repeat(y_res, 0)
    z = np.linspace(z_range[0], z_range[1], z_res)[None, :, None] \
        .repeat(y_res, 0).repeat(x_res, 2)
    y = np.linspace(y_range[0], y_range[1], y_res)[:, None, None] \
        .repeat(z_res, 1).repeat(x_res, 2)
    xyz = np.stack([x, y, z], axis=-1)
    xyz[..., 1] -= xyz[..., 2] * 0.0874886635  # tan(5 deg)
    return xyz.astype(np.float32), (x_res, y_res, z_res)


def project_into_cam(pts, proj):
    cam = (proj @ pts.T).T.copy()
    cam[:, :2] /= cam[:, 2:3]
    return cam, cam[:, 2].copy()


class BBoxOccEvaluator:
    def __init__(self, net: BTSNet, renderer_cfg, config: dict, dataset):
        self.net = net
        self.cfg = renderer_cfg
        self.z_near = config["z_near"]
        self.z_far = config["z_far"]
        self.query_batch_size = config.get("query_batch_size", 50000)
        self.occ_threshold = 0.5
        self.x_range = (-4, 4)
        self.y_range = (0, 1)
        self.z_range = (20, 3)
        self.ppm = 5
        self.ppm_y = 4
        self.dataset = dataset
        # Shard the dense density-grid query over every local device (see
        # DepthEvaluator; equivalence in tests/test_multidevice_eval.py).
        from behindthescenes_tpu.parallel.mesh import eval_mesh
        self.mesh = eval_mesh()
        self._encode = None
        self._fns_shape = None
        self._query = None

    def _build_fns(self, h, w, ph, pw):
        net = self.net
        cfg = self.cfg

        def encode_and_depth(variables, images, projs, poses, key):
            gray = jnp.mean(images, axis=-1, keepdims=True) * 0.5 + 0.5
            grid = net.apply(variables, images, projs, poses,
                             ids_encoder=[0], ids_render=[0],
                             images_alt=jnp.repeat(gray[:, :1], 3, -1),
                             method=BTSNet.encode)
            depth, _, _ = render_depth_selfview(
                net, variables, grid, key, ph, pw, cfg, self.z_near,
                self.z_far, as_z_depth=True)
            return grid, depth

        from behindthescenes_tpu.parallel.mesh import sharded_point_query

        def query_density(variables, grid, pts):
            def body(chunk):
                _, _, sigma = net.apply(variables, grid, chunk,
                                        only_density=True,
                                        method=BTSNet.query)
                return sigma[0, :, 0]

            return sharded_point_query(self.mesh, self.query_batch_size,
                                       body)(pts)

        return jax.jit(encode_and_depth), jax.jit(query_density)

    def evaluate(self, variables, batch, key=None) -> dict:
        key = key if key is not None else jax.random.PRNGKey(0)
        images = jnp.asarray(batch["imgs"])
        poses_np = np.asarray(batch["poses"])
        projs_np = np.asarray(batch["projs"])
        bboxes = batch["3d_bboxes"]
        if isinstance(bboxes, (list, tuple)) and len(bboxes) == 1 and \
                isinstance(bboxes[0], (list, tuple)):
            bboxes = bboxes[0]
        seg = np.asarray(batch["segs"]).reshape(
            images.shape[2], images.shape[3]) if "segs" in batch else None

        n, v, h, w, _ = images.shape
        ph, pw = h // 2, w // 2

        bboxes = [b for b in bboxes
                  if id2label[int(b["semanticId"])].category != "flat"]

        to_keyframe = np.linalg.inv(poses_np[0, 0])
        bboxes = [verts_to_cam(b, to_keyframe) for b in bboxes]
        bboxes = [b for b in bboxes
                  if bbox_in_frustum(b, projs_np[0, 0], self.z_range[0])]

        poses_w = (to_keyframe[None, None] @ poses_np).astype(np.float32)

        if self._encode is None or self._fns_shape != (h, w, ph, pw):
            # Shape-keyed: retrace on resolution change instead of reusing
            # the first batch's shapes.
            self._encode, self._query = self._build_fns(h, w, ph, pw)
            self._fns_shape = (h, w, ph, pw)
        # Encode at full res; render pseudo depth at half res
        # (reference :206-251 renders at h//2 x w//2).
        grid, pred_depth = self._encode(variables, images,
                                        jnp.asarray(projs_np),
                                        jnp.asarray(poses_w), key)
        pred_depth = np.asarray(pred_depth)[0]

        # Label-aware GT pseudo-depth from box intercepts.
        gt_depth = np.full((ph, pw), np.inf, dtype=np.float32)
        if bboxes and seg is not None:
            fnbs = [compute_bounds(b) for b in bboxes]
            labels_box = [int(b["semanticId"]) for b in bboxes]
            # Half-res pixel rays in camera space.
            xs = np.linspace(-1, 1, pw)
            ys = np.linspace(-1, 1, ph)
            gx, gy = np.meshgrid(xs, ys)
            k_mat = projs_np[0, 0]
            dirs = np.stack([(gx - k_mat[0, 2]) / k_mat[0, 0],
                             (gy - k_mat[1, 2]) / k_mat[1, 1],
                             np.ones_like(gx)], -1).reshape(-1, 3)
            dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
            seg_half = seg[(np.arange(ph) * (h / ph)).astype(int)][
                :, (np.arange(pw) * (w / pw)).astype(int)]
            labels_px = seg_half.reshape(-1)
            per_box = [bbox_intercept_labeled(dirs, labels_px, fnb, lb)
                       for fnb, lb in zip(fnbs, labels_box)]
            stacked = np.stack(per_box, axis=1)      # (n, nbox, 3)
            best = np.argmin(stacked[:, :, 2], axis=1)
            gt_depth = stacked[np.arange(len(best)), best, 2] \
                .reshape(ph, pw).astype(np.float32)

        q_pts, (xd, yd, zd) = get_pts(self.x_range, self.y_range,
                                      self.z_range, self.ppm, self.ppm_y)
        q_pts = q_pts.reshape(-1, 3)
        cam_pts, dists = project_into_cam(q_pts, projs_np[0, 0])
        gt_dist = _grid_sample_nearest_ac_true(
            np.nan_to_num(gt_depth, posinf=1e6), cam_pts[:, :2])
        pred_dist = _grid_sample_nearest_ac_true(pred_depth, cam_pts[:, :2])
        is_visible = (dists <= gt_dist) | (dists <= pred_dist)

        is_occupied = np.zeros(q_pts.shape[0], dtype=bool)
        for b in bboxes:
            if id2label[int(b["semanticId"])].category == "flat":
                continue
            is_occupied |= in_bbox(q_pts, compute_bounds(b))
        is_occupied &= ~is_visible

        densities = np.asarray(self._query(variables, grid,
                                           jnp.asarray(q_pts)))
        is_occupied_pred = densities > self.occ_threshold

        def safe_mean(x):
            return float(np.mean(x)) if x.size else float("nan")

        return {
            "o_acc": float(np.mean(is_occupied_pred == is_occupied)),
            "o_prec": safe_mean(is_occupied[is_occupied_pred]),
            "o_rec": safe_mean(is_occupied_pred[is_occupied]),
            "ie_acc": safe_mean(
                (is_occupied_pred == is_occupied)[~is_visible]),
            "ie_prec": safe_mean(
                (~is_occupied)[(~is_occupied_pred) & (~is_visible)]),
            "ie_rec": safe_mean(
                (~is_occupied_pred)[(~is_occupied) & (~is_visible)]),
            "ie_r": float(np.mean((~is_occupied) & (~is_visible))),
            "t_ie": float(np.sum((~is_occupied) & (~is_visible))),
        }
