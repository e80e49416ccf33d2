"""Dataset factory (reference datasets/data_util.py:11-217).

Maps config `data.type` to dataset implementations. Types mirror the
reference: KITTI_Raw, KITTI_360, KITTI_Odometry, RealEstate10k, Waymo,
NYU_Depth_V2 — plus Synthetic (in-memory, for CI/overfit runs).
"""
from __future__ import annotations

from behindthescenes_tpu.datasets.synthetic import SyntheticBoxDataset


def make_datasets(data_conf: dict):
    """-> (train_dataset, test_dataset)."""
    dtype = data_conf["type"]
    if dtype == "Synthetic":
        h, w = data_conf.get("image_size", (48, 64))
        fc = data_conf.get("data_fc", 2)
        length = data_conf.get("length", 64)
        scene = data_conf.get("scene", "street")
        thin = data_conf.get("thin_structures", 0)
        train = SyntheticBoxDataset(length=length, frame_count=fc + 2,
                                    height=h, width=w, return_depth=False,
                                    seed=1, scene_type=scene,
                                    thin_structures=thin)
        test = SyntheticBoxDataset(length=max(4, length // 8),
                                   frame_count=2, height=h, width=w,
                                   return_depth=True, seed=2,
                                   scene_type=scene, thin_structures=thin)
        return train, test
    if dtype == "KITTI_Raw":
        from behindthescenes_tpu.datasets.kitti_raw import KittiRawDataset
        return KittiRawDataset.make_train_test(data_conf)
    if dtype == "KITTI_360":
        from behindthescenes_tpu.datasets.kitti_360 import Kitti360Dataset
        return Kitti360Dataset.make_train_test(data_conf)
    if dtype == "RealEstate10k":
        from behindthescenes_tpu.datasets.realestate10k import (
            RealEstate10kDataset)
        return RealEstate10kDataset.make_train_test(data_conf)
    if dtype == "KITTI_Odometry":
        from behindthescenes_tpu.datasets.kitti_odom import (
            KittiOdometryDataset)
        return KittiOdometryDataset.make_train_test(data_conf)
    if dtype == "Waymo":
        from behindthescenes_tpu.datasets.waymo import WaymoDataset
        return WaymoDataset.make_train_test(data_conf)
    if dtype == "NYU_Depth_V2":
        from behindthescenes_tpu.datasets.nyu_depth_v2 import (
            NYUDepthV2Dataset)
        return None, NYUDepthV2Dataset.make_test(data_conf)
    raise NotImplementedError(f"Unsupported dataset type: {dtype}")


def make_test_dataset(data_conf: dict):
    """Test-only variant (reference data_util.py:181-217)."""
    _, test = make_datasets(data_conf)
    return test
