"""RealEstate10K loader test against a generated pickle + frame tree."""
import os
import pickle

import cv2
import numpy as np
import pytest

from behindthescenes_tpu.datasets.realestate10k import RealEstate10kDataset


@pytest.fixture(scope="module")
def re10k_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("re10k")
    rng = np.random.default_rng(0)
    key = "abc123"
    n = 8
    timestamps = [1000 + 100 * i for i in range(n)]
    # w2c 3x4 poses moving along x.
    poses = []
    for i in range(n):
        p = np.eye(4)
        p[0, 3] = -0.1 * i   # w2c translation
        poses.append(p[:3])
    intrinsics = np.tile(np.array([0.9, 1.2, 0.5, 0.5]), (n, 1))
    seq = {key: {"timestamps": timestamps,
                 "poses": np.stack(poses).astype(np.float32),
                 "intrinsics": intrinsics.astype(np.float32)}}
    for split in ("train", "test"):
        with open(root / f"{split}.pickle", "wb") as f:
            pickle.dump(seq, f)
        d = root / "frames" / split / key
        d.mkdir(parents=True)
        for ts in timestamps:
            img = rng.integers(0, 255, (72, 128, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f"{ts}.jpg"), img)
    with open(root / "index.txt", "w") as f:
        f.write(f"{key} 3\n")
    return root


def test_re10k_train(re10k_tree):
    ds = RealEstate10kDataset(str(re10k_tree), target_image_size=(36, 64),
                              frame_count=2)
    assert len(ds) > 0
    item = ds[1]
    assert item["imgs"].shape == (2, 36, 64, 3)
    assert item["poses"].shape == (2, 4, 4)
    # Pose is inverted w2c -> c2w: camera i at +0.1*i in x.
    # NDC intrinsics from normalized [fx fy cx cy].
    np.testing.assert_allclose(item["projs"][0, 0, 0], 1.8, atol=1e-6)
    np.testing.assert_allclose(item["projs"][0, 0, 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(item["depths"], 1.0)


def test_re10k_test_split(re10k_tree):
    ds = RealEstate10kDataset(str(re10k_tree),
                              split_path=str(re10k_tree / "index.txt"),
                              target_image_size=(36, 64), frame_count=2)
    assert len(ds) == 1
    item = ds[0]
    # keyframe id 3: c2w x-translation +0.3.
    np.testing.assert_allclose(item["poses"][0][0, 3], 0.3, atol=1e-6)


def test_re10k_random_dilation(re10k_tree):
    ds = RealEstate10kDataset(str(re10k_tree), target_image_size=(36, 64),
                              frame_count=2, dilation="random")
    item = ds[0]
    assert item["imgs"].shape == (2, 36, 64, 3)
