"""Blender camera-trajectory exporter
(reference scripts/blender/export_camera_trj.py:5-19): run INSIDE Blender's
python console to export the active camera's animated poses to a .npy that
gen_vid_nvs.py consumes. Converts Blender coords to the standard
x-right/y-down/z-forward convention.
"""
import numpy as np

try:
    import bpy
except ImportError:
    bpy = None

# Standard <- Blender coordinate change (see behindthescenes_tpu.geometry).
COORD_FROM_BLENDER = np.array(
    [[1, 0, 0, 0], [0, 0, 1, 0], [0, -1, 0, 0], [0, 0, 0, 1]],
    dtype=np.float32)
# Blender cameras look down -z with +y up; flip to +z forward, +y down.
CAM_FLIP = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)


def export(output_path="camera_trajectory.npy"):
    assert bpy is not None, "run inside Blender"
    scene = bpy.context.scene
    cam = scene.camera
    poses = []
    for frame in range(scene.frame_start, scene.frame_end + 1):
        scene.frame_set(frame)
        mat = np.asarray(cam.matrix_world, dtype=np.float32)
        poses.append(COORD_FROM_BLENDER @ mat @ CAM_FLIP)
    np.save(output_path, np.stack(poses))
    print(f"exported {len(poses)} poses to {output_path}")


if __name__ == "__main__":
    export()
