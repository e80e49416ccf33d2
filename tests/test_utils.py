"""Utils tests: plotting grids, mesh extraction, metrics extras."""
import numpy as np

from behindthescenes_tpu.utils.plotting import color_tensor, make_grid
from behindthescenes_tpu.utils.recon import marching_tetrahedra, save_obj


def test_color_tensor_shape():
    x = np.random.default_rng(0).uniform(0, 1, (2, 8, 10))
    out = color_tensor(x, "plasma")
    assert out.shape == (2, 8, 10, 3)
    assert out.min() >= 0 and out.max() <= 1


def test_make_grid():
    imgs = np.ones((5, 4, 6, 3))
    grid = make_grid(imgs, nrow=3, padding=1)
    # 2 rows x 3 cols with 1px padding
    assert grid.shape == (2 * 5 + 1, 3 * 7 + 1, 3)


def test_marching_tetrahedra_sphere():
    # Volume: inside a radius-0.3 sphere => extracted surface ~ that sphere.
    n = 32
    xs = np.linspace(-0.5, 0.5, n)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    vol = 0.3 - np.sqrt(gx ** 2 + gy ** 2 + gz ** 2)  # >0 inside
    verts, faces = marching_tetrahedra(vol, 0.0,
                                       spacing=(1 / (n - 1),) * 3,
                                       origin=(-0.5, -0.5, -0.5))
    assert len(verts) > 100 and len(faces) > 100
    radii = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.3, atol=0.02)
    assert radii.std() < 0.02
    # Faces index valid vertices.
    assert faces.max() < len(verts) and faces.min() >= 0


def test_marching_tetrahedra_empty():
    vol = np.zeros((8, 8, 8))
    verts, faces = marching_tetrahedra(vol, 0.5)
    assert len(verts) == 0 and len(faces) == 0


def test_save_obj(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], dtype=np.float32)
    faces = np.array([[0, 1, 2]], dtype=np.int32)
    path = tmp_path / "mesh.obj"
    save_obj(str(path), verts, faces)
    content = path.read_text()
    assert content.count("v ") == 3 and "f 1 2 3" in content


def test_fg_ari():
    from behindthescenes_tpu.utils.metrics_extra import (adjusted_rand_index,
                                                         fg_ari)
    a = np.array([0, 0, 1, 1, 2, 2])
    assert adjusted_rand_index(a, a) == 1.0
    assert adjusted_rand_index(a, np.array([1, 1, 0, 0, 5, 5])) == 1.0
    rng = np.random.default_rng(0)
    r = adjusted_rand_index(rng.integers(0, 3, 10000),
                            rng.integers(0, 3, 10000))
    assert abs(r) < 0.05
    tm = np.array([[0, 0, 1], [2, 2, 1]])
    assert fg_ari(tm, tm) == 1.0
