"""Native velodyne depth projection vs the numpy reference path."""
import numpy as np
import pytest

from behindthescenes_tpu import native
from behindthescenes_tpu.datasets.kitti_raw import project_velodyne_to_depth


@pytest.mark.skipif(not native.available(), reason="g++ unavailable")
def test_native_matches_numpy_reference():
    rng = np.random.default_rng(0)
    n = 5000
    pts = np.concatenate([
        rng.uniform(-5, 40, (n, 1)),    # x forward (some behind)
        rng.uniform(-10, 10, (n, 1)),
        rng.uniform(-2, 1, (n, 1)),
        np.ones((n, 1))], axis=1).astype(np.float32)
    # camera-style projection: velodyne x->z
    k = np.array([[700.0, 0, 600, 0], [0, 700.0, 180, 0], [0, 0, 1, 0]],
                 dtype=np.float32)
    rot = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0],
                    [0, 0, 0, 1]], dtype=np.float32)
    p = (k @ rot).astype(np.float32)
    size = (370, 1226)

    ref = project_velodyne_to_depth(pts.copy(), p, size,
                                    eigen_depth=False)[0]
    got = native.project_velodyne_depth(pts, p, size)

    # The numpy path replicates the reference's Counter-based duplicate
    # resolution (whose hash can collide); the native path does exact
    # per-pixel min. They agree except where that hash collides.
    nz = (ref > 0) & (got > 0)
    agree = np.isclose(ref[nz], got[nz]).mean()
    assert agree > 0.995, agree
    assert (got > 0).sum() >= (ref > 0).sum() * 0.99


@pytest.mark.skipif(not native.available(), reason="g++ unavailable")
def test_native_min_depth_for_duplicates():
    # Two points hitting the same pixel -> min depth wins.
    p = np.hstack([np.eye(3, dtype=np.float32),
                   np.zeros((3, 1), np.float32)])
    pts = np.array([[2.4, 2.4, 1.0, 1.0],
                    [4.8, 4.8, 2.0, 1.0]], dtype=np.float32)
    # native drops x<0; these have x>0. u=x/z
    out = native.project_velodyne_depth(pts, p, (4, 4))
    nz = out[out > 0]
    assert len(nz) == 1 and nz[0] == 1.0
