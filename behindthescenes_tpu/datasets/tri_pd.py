"""TRI Parallel Domain dataset (reference datasets/tri_pd/tri_pd_dataset.py —
an unofficial extra): synthetic driving scenes with moving/all instance
masks, per-camera calibration JSONs, optional 2D motion vectors. NHWC.
"""
from __future__ import annotations

import json
import math
import os

import cv2
import numpy as np
from scipy.spatial import transform

# Scenes excluded upstream for broken annotations
# (reference tri_pd_dataset.py:17-24).
BANNED_SCENES = {
    "scene_000100", "scene_000002", "scene_000008", "scene_000012",
    "scene_000018", "scene_000029", "scene_000038", "scene_000040",
    "scene_000043", "scene_000044", "scene_000049", "scene_000050",
    "scene_000053", "scene_000063", "scene_000079", "scene_000090",
    "scene_000094", "scene_000103", "scene_000106", "scene_000111",
    "scene_000112", "scene_000124", "scene_000125", "scene_000127",
    "scene_000148", "scene_000159", "scene_000166", "scene_000169",
    "scene_000170", "scene_000171", "scene_000187", "scene_000191",
    "scene_000200", "scene_000202", "scene_000217", "scene_000218",
    "scene_000225", "scene_000229", "scene_000232", "scene_000236",
    "scene_000237", "scene_000245", "scene_000249", "scene_000196",
    "scene_000156",
}

BASE_SIZE = (1216, 1936)


class TRIPDDataset:
    def __init__(self, split="train", root=None, supervision="moving",
                 frame_count=5, random_select=True, load_flow=False,
                 load_segs=True, seed=0):
        self.root_dir = root
        self.frame_count = frame_count
        self.random_select = random_select
        self.load_flow = load_flow
        self.load_segs = load_segs
        self._rng = np.random.default_rng(seed)

        files = sorted(os.listdir(root))
        if split == "train":
            files = files[1:]
        elif split == "eval":
            files = files[:1]

        if supervision == "moving":
            self.annotation = "moving_masks"
        elif supervision == "all":
            self.annotation = "ari_masks"
        else:
            raise ValueError("supervision must be 'moving' or 'all'")

        self.real_files, self.mask_files = [], []
        self.flow_files, self.calibrations = [], []
        for f in files:
            if f in BANNED_SCENES or not f.startswith("scene"):
                continue
            calib_dir = os.path.join(root, f, "calibration")
            with open(os.path.join(calib_dir,
                                   os.listdir(calib_dir)[0])) as cf:
                calib = json.load(cf)
            for i in (1, 5, 6, 7, 8, 9):
                if os.path.exists(os.path.join(root, f,
                                               f"rgb/camera_0{i}")):
                    self.real_files.append(f + f"/rgb/camera_0{i}")
                    self.mask_files.append(
                        f + f"/{self.annotation}/camera_0{i}")
                    self.flow_files.append(
                        f + f"/motion_vectors_2d/camera_0{i}")
                    self.calibrations.append(self.get_camera(calib, i))

    @staticmethod
    def get_image_name(i):
        return f"{(i + 1) * 5:018d}.png"

    @staticmethod
    def get_camera(calib_data, i):
        cam_idx = calib_data["names"].index(f"camera_0{i}")
        ext = calib_data["extrinsics"][cam_idx]
        intr = calib_data["intrinsics"][cam_idx]
        rot = transform.Rotation.from_quat(
            list(ext["rotation"].values())).as_matrix()
        local_pose = np.concatenate(
            [rot, np.array(list(ext["translation"].values()))
             .reshape(-1, 1)], axis=-1)
        proj = np.eye(4)
        proj[0, 0] = intr["fx"] * 2 / BASE_SIZE[1]
        proj[1, 1] = intr["fy"] * 2 / BASE_SIZE[0]
        proj[0, 2] = intr["cx"] / BASE_SIZE[1] - 0.5
        proj[1, 2] = intr["cy"] / BASE_SIZE[0] - 0.5
        return {"local_pose": local_pose, "projection_mat": proj}

    def __len__(self):
        return len(self.real_files) * (1 if self.random_select else 190)

    def __getitem__(self, index):
        if self.random_select:
            rand_id = int(self._rng.integers(0, 190)) + 1
            frame_ids = [rand_id + j for j in range(self.frame_count)]
            index %= len(self.real_files)
        else:
            offset = index % 190
            index //= 190
            frame_ids = [offset + j for j in range(self.frame_count)]

        path = self.real_files[index]
        imgs, segs, flows = [], [], []
        dim = None
        crop = 158
        for fid in frame_ids:
            img = cv2.imread(os.path.join(self.root_dir, path,
                                          self.get_image_name(fid)))
            if img is None:
                return self.__getitem__((index + 1) % len(self))
            ratio = 0.58
            dim = (int(math.ceil(img.shape[1] * ratio)),
                   int(math.ceil(img.shape[0] * ratio)))
            img = cv2.resize(img, dim, interpolation=cv2.INTER_LINEAR)
            img = img[crop:]
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            imgs.append(img.astype(np.float32) / 255.0 * 2.0 - 1.0)

            if self.load_segs:
                seg = cv2.imread(os.path.join(
                    self.root_dir, self.mask_files[index],
                    self.get_image_name(fid)), -1)
                if seg is None:
                    return self.__getitem__((index + 1) % len(self))
                seg = cv2.resize(seg, dim,
                                 interpolation=cv2.INTER_NEAREST)[crop:]
                # Remove tiny instances (<=50 px), matching upstream.
                values, indices, counts = np.unique(
                    seg, return_inverse=True, return_counts=True)
                mapping = np.arange(len(values))
                mapping[counts <= 50] = 0
                segs.append(mapping[indices].reshape(seg.shape))

            if self.load_flow:
                flow = cv2.imread(os.path.join(
                    self.root_dir, self.flow_files[index],
                    self.get_image_name(fid)), -1)
                if flow is not None:
                    flows.append(cv2.resize(
                        flow, dim,
                        interpolation=cv2.INTER_NEAREST)[crop:])

        calib = self.calibrations[index]
        out = {
            "imgs": np.stack(imgs).astype(np.float32),
            "projs": np.stack([calib["projection_mat"]] * len(imgs)),
            "poses": np.stack([np.vstack([calib["local_pose"],
                                          [0, 0, 0, 1]])] * len(imgs)),
            "meta-data": np.array([index]),
        }
        if segs:
            out["segs"] = np.stack(segs)
        if flows:
            out["flows"] = np.stack(flows)
        return out
