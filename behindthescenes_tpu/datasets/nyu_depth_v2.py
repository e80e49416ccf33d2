"""NYU Depth v2 labeled test set (reference
datasets/nyu_depth_v2/nyu_depth_v2_dataset.py): single-frame depth test
samples from the labeled .mat (h5) file; identity pose/intrinsics.
"""
from __future__ import annotations

import os

import cv2
import numpy as np


class NYUDepthV2Dataset:
    def __init__(self, data_path, target_image_size=(192, 640)):
        import h5py
        self.data_path = data_path
        self.target_image_size = tuple(target_image_size) \
            if target_image_size else None
        self._data = h5py.File(
            os.path.join(data_path, "nyu_depth_v2_labeled.mat"))
        self.length = self._data.get("images").shape[0]

    def _process_img(self, img):
        img = np.transpose(img, (2, 1, 0)).astype(np.float32) / 255.0
        if self.target_image_size:
            img = cv2.resize(img, (self.target_image_size[1],
                                   self.target_image_size[0]),
                             interpolation=cv2.INTER_LINEAR)
        return img * 2.0 - 1.0

    def _process_depth(self, depth):
        depth = np.transpose(depth, (1, 0))
        if self.target_image_size:
            depth = cv2.resize(depth, (self.target_image_size[1],
                                       self.target_image_size[0]),
                               interpolation=cv2.INTER_NEAREST)
        return depth[None]

    def __len__(self):
        return self.length

    def __getitem__(self, index):
        img = self._process_img(np.array(self._data.get("images")[index]))
        depth = self._process_depth(
            np.array(self._data.get("depths")[index]))
        return {
            "imgs": img[None].astype(np.float32),
            "depths": depth[None].astype(np.float32),
            "poses": np.eye(4, dtype=np.float32)[None],
            "projs": np.eye(3, dtype=np.float32)[None],
        }

    @classmethod
    def make_test(cls, conf: dict):
        return cls(conf["data_path"],
                   tuple(conf.get("image_size", (192, 640))))
