"""Camera geometry core (pure jnp).

Conventions (identical to the reference's data-dict ABI):
  * Intrinsics K are 3x3 matrices normalized to NDC: they map camera-space
    points to x/y in [-1, 1] over the image plane
    (see reference datasets/kitti_raw/kitti_raw_dataset.py:181-185).
  * Poses are camera-to-world 4x4 matrices.
  * A "ray" is an 8-vector [origin(3), direction(3), near(1), far(1)]
    (reference models/common/render/nerf.py:106).

Mirrors reference models/common/util/util.py:113-273 and
utils/projection_operations.py:4-16, re-designed as pure functions.
"""
from __future__ import annotations

import jax.numpy as jnp


def unproj_map(width: int, height: int, focal, c=None, norm_dir: bool = True,
               dtype=jnp.float32) -> jnp.ndarray:
    """Per-pixel camera-frame ray directions for an NDC pinhole camera.

    The pixel grid spans [-1, 1] inclusive in both axes (matching the
    reference's `torch.linspace(-1, 1, W)` convention, util.py:140-141).

    Args:
      width, height: image size (static).
      focal: focal lengths; scalar, (2,) [fx, fy], or (B, 2).
      c: principal point offsets in NDC; None (=0), scalar, (2,), or (B, 2).
      norm_dir: normalize directions to unit length.
    Returns:
      (B, H, W, 3) array of camera-frame ray directions (B=1 if unbatched).
    """
    focal = jnp.asarray(focal, dtype=dtype)
    if focal.ndim == 0:
        focal = focal[None, None].repeat(2, axis=1)
    elif focal.ndim == 1:
        focal = focal[None, :]
    if c is None:
        c = jnp.zeros((1, 2), dtype=dtype)
    else:
        c = jnp.asarray(c, dtype=dtype)
        if c.ndim == 0:
            c = c[None, None].repeat(2, axis=1)
        elif c.ndim == 1:
            c = c[None, :]
    n = focal.shape[0]

    x = jnp.linspace(-1.0, 1.0, width, dtype=dtype)
    y = jnp.linspace(-1.0, 1.0, height, dtype=dtype)
    xy = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)  # (H, W, 2)
    xy = (xy[None] - c[:, None, None, :]) / focal[:, None, None, :]  # (B,H,W,2)
    z = jnp.ones(xy.shape[:-1] + (1,), dtype=dtype)
    unproj = jnp.concatenate([xy, z], axis=-1)
    if norm_dir:
        unproj = unproj / jnp.linalg.norm(unproj, axis=-1, keepdims=True)
    if unproj.shape[0] != n:
        unproj = jnp.broadcast_to(unproj, (n,) + unproj.shape[1:])
    return unproj


def gen_rays(poses: jnp.ndarray, width: int, height: int, z_near, z_far,
             focal=None, c=None, norm_dir: bool = True) -> jnp.ndarray:
    """Generate world-space camera rays for a batch of cameras.

    Mirrors reference util.py:244-273.

    Args:
      poses: (V, 4, 4) camera-to-world matrices.
      focal: (V, 2) focal lengths [fx, fy] (NDC units).
      c: (V, 2) principal point [cx, cy] (NDC units).
    Returns:
      (V, H, W, 8) rays = [origin, direction, near, far].
    """
    v = poses.shape[0]
    dirs_cam = unproj_map(width, height, focal, c=c, norm_dir=norm_dir,
                          dtype=poses.dtype)  # (V, H, W, 3)
    if dirs_cam.shape[0] == 1 and v > 1:
        dirs_cam = jnp.broadcast_to(dirs_cam, (v, height, width, 3))
    origins = jnp.broadcast_to(poses[:, None, None, :3, 3], (v, height, width, 3))
    # dirs_world[b,h,w,i] = R[b,i,j] * dirs_cam[b,h,w,j]
    dirs_world = jnp.einsum("vij,vhwj->vhwi", poses[:, :3, :3], dirs_cam,
                            precision="highest")
    nears = jnp.full((v, height, width, 1), z_near, dtype=poses.dtype)
    fars = jnp.full((v, height, width, 1), z_far, dtype=poses.dtype)
    return jnp.concatenate([origins, dirs_world, nears, fars], axis=-1)


def distance_to_z(depths: jnp.ndarray, projs: jnp.ndarray) -> jnp.ndarray:
    """Convert ray-distance depth maps to planar z-depth.

    Mirrors reference utils/projection_operations.py:4-16.

    Args:
      depths: (n, nv, h, w) per-pixel distances along (normalized) rays.
      projs: (n, nv, 3, 3) NDC intrinsics.
    Returns:
      (n, nv, h, w) z-depths.
    """
    n, nv, h, w = depths.shape
    inv_k = jnp.linalg.inv(projs)
    gx = jnp.linspace(-1.0, 1.0, w, dtype=depths.dtype)
    gy = jnp.linspace(-1.0, 1.0, h, dtype=depths.dtype)
    gxx, gyy = jnp.meshgrid(gx, gy, indexing="xy")
    pts = jnp.stack([gxx, gyy, jnp.ones_like(gxx)], axis=0).reshape(3, -1)  # (3, h*w)
    cam_pts = jnp.einsum("nvij,jp->nvip", inv_k, pts,
                         precision="highest")  # (n, nv, 3, h*w)
    factors = cam_pts[:, :, 2, :] / jnp.linalg.norm(cam_pts, axis=2)
    return depths * factors.reshape(n, nv, h, w)


def invert_pose(poses: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of rigid 4x4 camera poses (..., 4, 4).

    Cheaper and numerically cleaner than a general matrix inverse on TPU.
    """
    rot = poses[..., :3, :3]
    t = poses[..., :3, 3:]
    rot_t = jnp.swapaxes(rot, -1, -2)
    t_new = -jnp.matmul(rot_t, t, precision="highest")
    top = jnp.concatenate([rot_t, t_new], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=poses.dtype),
        poses.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rebase_poses_to_keyframe(poses: jnp.ndarray) -> jnp.ndarray:
    """Express all poses relative to view 0 (the keyframe).

    Mirrors reference models/bts/trainer.py:98-99.

    Args:
      poses: (n, v, 4, 4) camera-to-world.
    Returns:
      (n, v, 4, 4) with poses[:, 0] == identity.
    """
    to_base = invert_pose(poses[:, :1])
    return jnp.matmul(to_base, poses, precision="highest")


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) batch -> rotation matrices
    (reference util.py:481-510). q: (..., 4) -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rot = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return rot.reshape(q.shape[:-1] + (3, 3))


def rot_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices -> unit quaternions (w, x, y, z)
    (reference util.py:513-525 semantics; numerically-stable branch-free
    form). rot: (..., 3, 3) -> (..., 4)."""
    m00, m01, m02 = rot[..., 0, 0], rot[..., 0, 1], rot[..., 0, 2]
    m10, m11, m12 = rot[..., 1, 0], rot[..., 1, 1], rot[..., 1, 2]
    m20, m21, m22 = rot[..., 2, 0], rot[..., 2, 1], rot[..., 2, 2]
    tr = m00 + m11 + m22
    w = jnp.sqrt(jnp.maximum(0.0, 1 + tr)) / 2
    x = jnp.sqrt(jnp.maximum(0.0, 1 + m00 - m11 - m22)) / 2
    y = jnp.sqrt(jnp.maximum(0.0, 1 - m00 + m11 - m22)) / 2
    z = jnp.sqrt(jnp.maximum(0.0, 1 - m00 - m11 + m22)) / 2
    x = x * jnp.sign(jnp.where(m21 - m12 == 0, 1.0, m21 - m12))
    y = y * jnp.sign(jnp.where(m02 - m20 == 0, 1.0, m02 - m20))
    z = z * jnp.sign(jnp.where(m10 - m01 == 0, 1.0, m10 - m01))
    return jnp.stack([w, x, y, z], axis=-1)


def look_at(origin, target, world_up=(0.0, 1.0, 0.0)):
    """Camera-to-world matrix looking from origin at target
    (reference util.py:180-196). numpy, host-side."""
    import numpy as np
    origin = np.asarray(origin, dtype=np.float32)
    target = np.asarray(target, dtype=np.float32)
    world_up = np.asarray(world_up, dtype=np.float32)
    back = origin - target
    back = back / np.linalg.norm(back)
    right = np.cross(world_up, back)
    right = right / np.linalg.norm(right)
    up = np.cross(back, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = right
    c2w[:3, 1] = up
    c2w[:3, 2] = back
    c2w[:3, 3] = origin
    return c2w


def coord_from_blender():
    """Blender -> standard coords (reference util.py:152-163)."""
    import numpy as np
    return np.array([[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0],
                     [0, 0, 0, 1]], dtype=np.float32)


def coord_to_blender():
    """Standard -> Blender coords (reference util.py:166-177)."""
    import numpy as np
    return np.array([[1, 0, 0, 0], [0, 0, -1, 0], [0, 1, 0, 0],
                     [0, 0, 0, 1]], dtype=np.float32)


def project_points(xyz: jnp.ndarray, poses_w2c: jnp.ndarray, ks: jnp.ndarray,
                   eps: float = 1e-3):
    """Project world points into NDC image coordinates of multiple cameras.

    Mirrors the projection math in reference models_bts.py:145-155.

    Args:
      xyz: (n, p, 3) world points.
      poses_w2c: (n, v, 4, 4) world-to-camera.
      ks: (n, v, 3, 3) NDC intrinsics.
    Returns:
      xy: (n, v, p, 2) NDC coords; z: (n, v, p, 1) camera z;
      distance: (n, v, p, 1) camera-space distance; invalid: (n, v, p, 1) bool.
    """
    # Unrolled 3x3 mat-vecs: einsum with K=3/4 lowers to MXU matmuls padded
    # to 128 lanes (measured 2.8ms per 245k points standalone); elementwise
    # VPU ops are exact f32 and fuse with the surrounding index math.
    rot = poses_w2c[:, :, :3, :3]
    trans = poses_w2c[:, :, :3, 3]
    px, py, pz = (xyz[:, None, :, 0], xyz[:, None, :, 1], xyz[:, None, :, 2])

    def matvec3(m, x, y, z, t=None):
        # m: (n, v, 3, 3) applied per view to per-point (x, y, z).
        out = []
        for i in range(3):
            o = (m[:, :, i, 0, None] * x + m[:, :, i, 1, None] * y
                 + m[:, :, i, 2, None] * z)
            if t is not None:
                o = o + t[:, :, i, None]
            out.append(o)
        return out

    cx, cy, cz = matvec3(rot, px, py, pz, trans)
    distance = jnp.sqrt(cx * cx + cy * cy + cz * cz)[..., None]
    ux, uy, uz = matvec3(ks, cx, cy, cz)
    xy = jnp.stack([ux, uy], axis=-1)
    z = uz[..., None]
    xy = xy / jnp.maximum(z, eps)
    invalid = (
        (z <= eps)
        | (xy[..., :1] < -1) | (xy[..., :1] > 1)
        | (xy[..., 1:2] < -1) | (xy[..., 1:2] > 1)
    )
    return xy, z, distance, invalid
