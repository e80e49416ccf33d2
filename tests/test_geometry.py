import jax.numpy as jnp
import numpy as np

from behindthescenes_tpu import geometry


def rand_pose(rng):
    # Random rotation via QR, positive determinant.
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = q
    pose[:3, 3] = rng.standard_normal(3)
    return pose


def test_unproj_map_center_pixel_points_forward():
    # Odd resolution => exact center pixel maps to NDC (0, 0) => ray (0,0,1).
    m = geometry.unproj_map(5, 5, focal=jnp.array([1.0, 1.0]), norm_dir=True)
    center = np.asarray(m[0, 2, 2])
    np.testing.assert_allclose(center, [0, 0, 1], atol=1e-6)
    # Norms are 1 everywhere.
    np.testing.assert_allclose(np.linalg.norm(np.asarray(m), axis=-1), 1.0,
                               atol=1e-5)


def test_gen_rays_identity_pose():
    pose = jnp.eye(4)[None]
    focal = jnp.array([[2.0, 2.0]])
    c = jnp.array([[0.0, 0.0]])
    rays = geometry.gen_rays(pose, 9, 7, z_near=1.0, z_far=10.0, focal=focal, c=c)
    assert rays.shape == (1, 7, 9, 8)
    np.testing.assert_allclose(np.asarray(rays[..., :3]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(rays[..., 6]), 1.0)
    np.testing.assert_allclose(np.asarray(rays[..., 7]), 10.0)
    # Center ray points along +z.
    np.testing.assert_allclose(np.asarray(rays[0, 3, 4, 3:6]), [0, 0, 1],
                               atol=1e-6)


def test_gen_rays_rotates_with_pose():
    rng = np.random.default_rng(0)
    pose = rand_pose(rng)
    rays = geometry.gen_rays(jnp.asarray(pose)[None], 5, 5, 0.5, 4.0,
                             focal=jnp.array([[1.5, 1.5]]))
    np.testing.assert_allclose(np.asarray(rays[0, 2, 2, 3:6]), pose[:3, 2],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rays[0, 0, 0, :3]), pose[:3, 3],
                               atol=1e-6)


def test_invert_pose_matches_linalg_inv():
    rng = np.random.default_rng(1)
    poses = np.stack([rand_pose(rng) for _ in range(4)]).reshape(2, 2, 4, 4)
    inv = np.asarray(geometry.invert_pose(jnp.asarray(poses)))
    np.testing.assert_allclose(inv, np.linalg.inv(poses), atol=1e-5)


def test_rebase_poses_keyframe_is_identity():
    rng = np.random.default_rng(2)
    poses = np.stack([rand_pose(rng) for _ in range(3)])[None]
    rebased = np.asarray(geometry.rebase_poses_to_keyframe(jnp.asarray(poses)))
    np.testing.assert_allclose(rebased[0, 0], np.eye(4), atol=1e-5)
    # Relative transforms preserved.
    rel_orig = np.linalg.inv(poses[0, 1]) @ poses[0, 2]
    rel_new = np.linalg.inv(rebased[0, 1]) @ rebased[0, 2]
    np.testing.assert_allclose(rel_new, rel_orig, atol=1e-4)


def test_project_points_roundtrip():
    rng = np.random.default_rng(3)
    # Camera at origin looking down +z with NDC intrinsics.
    k = np.array([[0.7, 0, 0.01], [0, 0.9, -0.02], [0, 0, 1]], dtype=np.float32)
    pts_cam = np.stack([
        rng.uniform(-0.5, 0.5, 16), rng.uniform(-0.5, 0.5, 16),
        rng.uniform(1.0, 5.0, 16)], axis=-1).astype(np.float32)
    xy, z, dist, invalid = geometry.project_points(
        jnp.asarray(pts_cam)[None], jnp.eye(4)[None, None],
        jnp.asarray(k)[None, None])
    expected_xy = (k[:2, :2] @ (pts_cam[:, :2] / pts_cam[:, 2:]).T).T \
        + k[:2, 2]
    np.testing.assert_allclose(np.asarray(xy[0, 0]), expected_xy, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z[0, 0, :, 0]), pts_cam[:, 2],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dist[0, 0, :, 0]),
                               np.linalg.norm(pts_cam, axis=-1), atol=1e-5)
    # Behind-camera points are invalid.
    behind = pts_cam.copy()
    behind[:, 2] *= -1
    _, _, _, inv2 = geometry.project_points(
        jnp.asarray(behind)[None], jnp.eye(4)[None, None],
        jnp.asarray(k)[None, None])
    assert bool(np.all(np.asarray(inv2)))


def test_distance_to_z_center_ray_unchanged():
    # For the exact optical center the factor is 1 (ray == z axis).
    k = np.eye(3, dtype=np.float32)
    depths = np.full((1, 1, 5, 5), 2.0, dtype=np.float32)
    z = np.asarray(geometry.distance_to_z(jnp.asarray(depths),
                                          jnp.asarray(k)[None, None]))
    assert abs(z[0, 0, 2, 2] - 2.0) < 1e-5
    # Corners foreshorten (distance > z).
    assert z[0, 0, 0, 0] < 2.0


def test_quat_rot_roundtrip():
    rng = np.random.default_rng(5)
    q = rng.standard_normal((16, 4)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    q = q * np.sign(q[:, :1])  # canonical sign (w >= 0)
    rot = geometry.quat_to_rot(jnp.asarray(q))
    # Valid rotations: orthonormal, det 1.
    rn = np.asarray(rot)
    np.testing.assert_allclose(rn @ rn.transpose(0, 2, 1),
                               np.broadcast_to(np.eye(3), rn.shape),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(rn), 1.0, atol=1e-5)
    q_back = np.asarray(geometry.rot_to_quat(rot))
    np.testing.assert_allclose(q_back, q, atol=1e-4)
