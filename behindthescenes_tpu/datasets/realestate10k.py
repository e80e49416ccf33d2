"""RealEstate10K dataset (reference
datasets/realestate10k/realestate10k_dataset.py): pickled per-sequence
{timestamps, intrinsics, poses}; frames on disk as frames/<split>/<key>/
<timestamp>.jpg. Poses in the pickle are world-to-camera 3x4 and are
inverted to camera-to-world; intrinsics are normalized [fx fy cx cy] and
are converted to NDC.
"""
from __future__ import annotations

import os
import pickle
from pathlib import Path
from typing import Optional

import cv2
import numpy as np

from behindthescenes_tpu.datasets.augmentation import sample_color_jitter


class RealEstate10kDataset:
    def __init__(self, data_path: str, split_path: Optional[str] = None,
                 target_image_size=(256, 384), frame_count=2, dilation=1,
                 keyframe_offset=0, color_aug=False, seed=0):
        self.data_path = data_path
        self.split_path = split_path
        self.target_image_size = tuple(target_image_size)
        self.frame_count = frame_count
        self.dilation = dilation
        self.keyframe_offset = keyframe_offset
        self.color_aug = color_aug
        self._rng = np.random.default_rng(seed)

        self.split = "train" if split_path is None else "test"
        self._seq_data = self._load_seq_data(data_path, self.split)
        self._seq_keys = list(self._seq_data.keys())

        if isinstance(dilation, int):
            self._left_offset = ((frame_count - 1) // 2 + keyframe_offset) \
                * dilation
            extra = (frame_count - 1) * dilation
        else:
            self._left_offset = 0
            extra = 0

        if self.split == "train":
            self._key_id_pairs = self._full_index(
                self._seq_keys, self._seq_data, self._left_offset, extra)
        else:
            self._key_id_pairs = self._load_index(split_path)

        self._skip = 0
        self.length = len(self._key_id_pairs)

    @staticmethod
    def _load_seq_data(data_path, split):
        with open(Path(data_path) / f"{split}.pickle", "rb") as f:
            return pickle.load(f)

    @staticmethod
    def _full_index(seq_keys, seq_data, left_offset, extra_frames):
        pairs = []
        for k in seq_keys:
            seq_len = len(seq_data[k]["timestamps"])
            pairs += [(k, i + left_offset)
                      for i in range(seq_len - extra_frames)]
        return pairs

    @staticmethod
    def _load_index(index_path):
        with open(index_path) as f:
            lines = f.readlines()
        return [(p.split(" ")[0], int(p.split(" ")[1])) for p in lines]

    @staticmethod
    def process_pose(pose):
        pose = np.concatenate(
            [pose.astype(np.float32),
             np.array([[0, 0, 0, 1]], dtype=np.float32)], axis=0)
        return np.linalg.inv(pose)

    @staticmethod
    def process_projs(proj):
        k = np.eye(3, dtype=np.float32)
        k[0, 0] = 2 * proj[0]
        k[1, 1] = 2 * proj[1]
        k[0, 2] = 2 * proj[2] - 1
        k[1, 2] = 2 * proj[3] - 1
        return k

    def _load_image(self, key, frame_id):
        ts = self._seq_data[key]["timestamps"][frame_id]
        img = cv2.cvtColor(cv2.imread(os.path.join(
            self.data_path, "frames", self.split, key, f"{ts}.jpg")),
            cv2.COLOR_BGR2RGB)
        return img.astype(np.float32) / 255.0

    def _process_img(self, img, color_aug_fn=None):
        th, tw = self.target_image_size
        img = cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR)
        if color_aug_fn is not None:
            img = color_aug_fn(img)
        return img * 2.0 - 1.0

    def __len__(self):
        return self.length

    def __getitem__(self, index):
        if index >= self.length:
            raise IndexError()
        index += self._skip
        key, kf = self._key_id_pairs[index]
        seq_len = len(self._seq_data[key]["timestamps"])

        if self.dilation == "random":
            dilation = int(self._rng.integers(1, 30))
            left_offset = self._left_offset
            if self.frame_count > 2:
                left_offset = dilation * (self.frame_count // 2)
        else:
            dilation = self.dilation
            left_offset = self._left_offset

        ids = [kf] + [max(min(i, seq_len - 1), 0)
                      for i in range(kf - left_offset,
                                     kf - left_offset
                                     + self.frame_count * dilation,
                                     dilation)
                      if i != kf]

        color_aug_fn = sample_color_jitter(self._rng) if self.color_aug \
            else None
        imgs = [self._process_img(self._load_image(key, i), color_aug_fn)
                for i in ids]
        poses = [self.process_pose(self._seq_data[key]["poses"][i])
                 for i in ids]
        projs = [self.process_projs(self._seq_data[key]["intrinsics"][i])
                 for i in ids]

        return {
            "imgs": np.stack(imgs).astype(np.float32),
            "projs": np.stack(projs).astype(np.float32),
            "poses": np.stack(poses).astype(np.float32),
            # Unit dummy depth (reference realestate10k_dataset.py:157).
            "depths": np.ones((1, 1) + self.target_image_size,
                              dtype=np.float32),
        }

    @classmethod
    def make_train_test(cls, conf: dict):
        common = dict(
            data_path=conf["data_path"],
            target_image_size=tuple(conf.get("image_size", (256, 384))),
            frame_count=conf.get("data_fc", 2),
            keyframe_offset=conf.get("keyframe_offset", 0),
        )
        train = cls(split_path=None, dilation=conf.get("dilation", 1),
                    color_aug=conf.get("color_aug", False), **common)
        test = cls(split_path=conf.get("split_path"),
                   dilation=conf.get("test_dilation", 10), **common)
        return train, test
