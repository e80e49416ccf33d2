"""VIPER synthetic dataset (reference datasets/viper/viper_dataset.py —
an unofficial extra): images + instance segmentations + optical flow with
per-frame projection/view matrices from the camera CSVs. NHWC output.
"""
from __future__ import annotations

import glob
import os

import cv2
import numpy as np

ID_TO_CLASS = {
    0: "unlabeled", 1: "ambiguous", 2: "sky", 3: "road", 4: "sidewalk",
    5: "railtrack", 6: "terrain", 7: "tree", 8: "vegetation", 9: "building",
    10: "infrastructure", 11: "fence", 12: "billboard", 13: "trafficlight",
    14: "trafficsign", 15: "mobilebarrier", 16: "firehydrant", 17: "chair",
    18: "trash", 19: "trashcan", 20: "person", 21: "animal", 22: "bicycle",
    23: "motorcycle", 24: "car", 25: "van", 26: "bus", 27: "truck",
    28: "trailer", 29: "train", 30: "plane", 31: "boat",
}
DYNAMIC_CLASS_IDS = np.array([20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30,
                              31])
BASE_SIZE = (1080, 1920)
BASE_CROP = (180, 0, 720, 1920)  # (y, x, h, w)


def _apply_crop(img, box):
    y, x, h, w = box
    return img[int(y):int(y) + int(h), int(x):int(x) + int(w)]


class ViperDataset:
    def __init__(self, base_path: str, frame_count=2, every_nth=10,
                 target_size=(128, 192), load_flow=True, load_segs=True):
        self.base_path = base_path
        self.frame_count = frame_count
        self.every_nth = every_nth
        self.target_size = tuple(target_size)
        self.load_flow = load_flow
        self.load_segs = load_segs

        self.sequences = sorted(os.listdir(os.path.join(base_path, "img")))
        self.img_paths = [sorted(glob.glob(os.path.join(
            base_path, "img", s, "*.jpg"))) for s in self.sequences]
        self.flow_paths = [sorted(glob.glob(os.path.join(
            base_path, "flow", s, "*.npz"))) for s in self.sequences]
        self.seg_paths = [sorted(glob.glob(os.path.join(
            base_path, "inst", s, "*.png"))) for s in self.sequences]

        self.projection_mats, self.view_mats = self._load_cameras()
        self.sequence_lengths = [
            (len(p) - frame_count + 1) // every_nth for p in self.img_paths]
        self.crop, cam_scale = self._precompute_crop()
        self.projection_mats = [p @ cam_scale for p in self.projection_mats]

    def _load_cameras(self):
        cam_dir = os.path.join(self.base_path, "camera")
        projs, views = [], []
        for s in self.sequences:
            raw = np.loadtxt(os.path.join(cam_dir, f"{s}.csv"),
                             delimiter=",", skiprows=1)
            projs.append(raw[:, 1:17].reshape(-1, 4, 4))
            views.append(raw[:, 17:].reshape(-1, 4, 4))
        return projs, views

    def _precompute_crop(self):
        h_ratio = self.target_size[0] / BASE_CROP[2]
        w_ratio = self.target_size[1] / BASE_CROP[3]
        if h_ratio < w_ratio:
            h_new = int(self.target_size[0] / w_ratio)
            w_new = BASE_CROP[3]
            crop = ((BASE_CROP[2] - h_new) // 2, 0, h_new, w_new)
        else:
            h_new = BASE_CROP[2]
            w_new = int(self.target_size[1] / h_ratio)
            crop = (0, (BASE_CROP[3] - w_new) // 2, h_new, w_new)
        cam_scale = np.eye(4)
        cam_scale[0, 0] = BASE_SIZE[1] / w_new
        cam_scale[1, 1] = BASE_SIZE[0] / h_new
        return crop, cam_scale

    def __len__(self):
        return sum(self.sequence_lengths)

    def __getitem__(self, index):
        if index >= len(self):
            raise IndexError
        seq = 0
        while seq < len(self.sequence_lengths) and \
                index >= self.sequence_lengths[seq]:
            index -= self.sequence_lengths[seq]
            seq += 1

        wh = (self.target_size[1], self.target_size[0])

        imgs, segs, flows = [], [], []
        for i in range(self.frame_count):
            img = cv2.cvtColor(cv2.imread(
                self.img_paths[seq][index * self.every_nth + i]),
                cv2.COLOR_BGR2RGB).astype(np.float32) / 255
            img = cv2.resize(_apply_crop(_apply_crop(img, BASE_CROP),
                                         self.crop), wh,
                             interpolation=cv2.INTER_LINEAR)
            imgs.append(img * 2.0 - 1.0)

            if self.load_segs:
                seg = cv2.cvtColor(cv2.imread(
                    self.seg_paths[seq][index * self.every_nth + i]),
                    cv2.COLOR_BGR2RGB)
                seg = cv2.resize(_apply_crop(_apply_crop(seg, BASE_CROP),
                                             self.crop), wh,
                                 interpolation=cv2.INTER_NEAREST)
                cls = np.any(seg[:, :, :1] == DYNAMIC_CLASS_IDS,
                             axis=-1).astype(np.int32)
                iid = seg[:, :, 1].astype(np.int32) * 256 + seg[:, :, 2]
                segs.append(np.stack([cls, iid], axis=-1))

        if self.load_flow:
            flow = np.load(self.flow_paths[seq][index])
            flow = np.stack((flow["u"], flow["v"]), axis=-1)
            flow[np.isnan(flow)] = 0
            flow3 = np.concatenate(
                [flow, np.zeros(BASE_SIZE + (1,))], axis=-1)
            flow = cv2.resize(_apply_crop(_apply_crop(flow3, BASE_CROP),
                                          self.crop), wh,
                              interpolation=cv2.INTER_NEAREST)[:, :, :2]
            flows.append(flow)

        out = {
            "imgs": np.stack(imgs).astype(np.float32),
            "projs": np.stack([self.projection_mats[seq][index + i]
                               for i in range(self.frame_count)]),
            "poses": np.stack([self.view_mats[seq][index + i]
                               for i in range(self.frame_count)]),
            "meta-data": np.array([seq, index]),
        }
        if segs:
            out["segs"] = np.stack(segs)
        if flows:
            out["flows"] = np.stack(flows).astype(np.float32)
        return out
