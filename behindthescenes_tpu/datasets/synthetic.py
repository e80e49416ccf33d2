"""Synthetic in-memory dataset: procedurally rendered box scenes with exact
analytic depth. Replaces disk loaders in tests and overfit harnesses
(SURVEY.md §4: the rebuild's substitute for the reference's missing tests).

Scene: a ground plane plus a few colored axis-aligned boxes; cameras translate
along +x with small rotations. Images are ray-cast on the host with numpy —
slow but exact, giving ground-truth depth for metric tests.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from behindthescenes_tpu.datasets.raycast import raycast_boxes


@dataclasses.dataclass
class SyntheticBoxDataset:
    """Returns the reference data-dict ABI: imgs (v,h,w,3) in [-1,1],
    projs (v,3,3) NDC, poses (v,4,4) c2w, depths (1,h,w)."""
    length: int = 16
    frame_count: int = 2
    height: int = 48
    width: int = 64
    z_near: float = 1.0
    z_far: float = 40.0
    return_depth: bool = True
    seed: int = 0
    # Samples are deterministic in (seed, idx); cache them so only the
    # first epoch pays the host-side raycast (~0.3s/sample at 192x640 —
    # the bottleneck of flagship-shape synthetic training otherwise).
    cache: bool = True

    def __post_init__(self):
        self._cache = {}

    def __len__(self):
        return self.length

    def _scene(self, rng):
        boxes = []
        for _ in range(4):
            cx = rng.uniform(-4, 4)
            cz = rng.uniform(6, 18)
            s = rng.uniform(0.8, 2.5)
            h = rng.uniform(1.0, 3.0)
            color = rng.uniform(0.2, 1.0, 3)
            boxes.append((np.array([cx - s, -1.0, cz - s]),
                          np.array([cx + s, -1.0 + h, cz + s]), color))
        return boxes

    def _raycast(self, origin, dirs, boxes):
        """dirs: (h, w, 3) unit. Returns rgb (h,w,3) in [0,1], depth (h,w)."""
        rgb, t_hit, _ = raycast_boxes(origin, dirs, boxes, ground_y=-1.0)
        depth_z = np.where(np.isinf(t_hit), 0.0, t_hit * dirs[..., 2])
        return rgb.astype(np.float32), depth_z.astype(np.float32)

    def __getitem__(self, idx):
        if self.cache and idx in self._cache:
            return self._cache[idx]
        out = self._generate(idx)
        if self.cache:
            self._cache[idx] = out
        return out

    def _generate(self, idx):
        rng = np.random.default_rng(self.seed * 100003 + idx)
        boxes = self._scene(rng)
        h, w = self.height, self.width
        fx, fy = 1.2, 1.2 * w / h   # NDC focal lengths
        k = np.array([[fx, 0, 0], [0, fy, 0], [0, 0, 1]], dtype=np.float32)

        xs = np.linspace(-1, 1, w)
        ys = np.linspace(-1, 1, h)
        gx, gy = np.meshgrid(xs, ys)
        dirs_cam = np.stack([gx / fx, gy / fy, np.ones_like(gx)], axis=-1)
        dirs_cam /= np.linalg.norm(dirs_cam, axis=-1, keepdims=True)

        imgs, poses, projs, depths = [], [], [], []
        for v in range(self.frame_count):
            pose = np.eye(4, dtype=np.float32)
            pose[0, 3] = 0.4 * v + rng.normal(0, 0.02)
            pose[1, 3] = rng.normal(0, 0.01)
            theta = rng.normal(0, 0.01)
            pose[:3, :3] = np.array([
                [np.cos(theta), 0, np.sin(theta)],
                [0, 1, 0],
                [-np.sin(theta), 0, np.cos(theta)]], dtype=np.float32)
            dirs_world = dirs_cam @ pose[:3, :3].T
            rgb, depth_z = self._raycast(pose[:3, 3], dirs_world, boxes)
            imgs.append(rgb * 2.0 - 1.0)
            poses.append(pose)
            projs.append(k)
            if v == 0:
                depths.append(depth_z[None])

        out = {
            "imgs": np.stack(imgs).astype(np.float32),
            "poses": np.stack(poses),
            "projs": np.stack(projs),
        }
        if self.return_depth:
            out["depths"] = np.stack(depths)
        return out


def collate(samples):
    """Stack a list of sample dicts into a batch dict (leading n dim).

    Ragged metadata fields (e.g. KITTI-360's `3d_bboxes`, a per-sample
    LIST of box dicts) pass through as plain lists — np.stack would turn
    them into object arrays that downstream `b["semanticId"]` indexing
    chokes on."""
    keys = samples[0].keys()
    out = {}
    for k in keys:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], (list, tuple, dict)):
            out[k] = vals
        else:
            out[k] = np.stack(vals)
    return out
