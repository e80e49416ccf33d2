"""Image IO helpers (reference utils/io.py): 8/16-bit reading and writing."""
from __future__ import annotations

import cv2
import numpy as np


def read_image(path: str) -> np.ndarray:
    """RGB float32 [0,1]."""
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if img.dtype == np.uint16:
        return img.astype(np.float32) / 65535.0
    return img.astype(np.float32) / 255.0


def write_image(path: str, img: np.ndarray, bit16: bool = False):
    """img: RGB float [0,1]."""
    img = np.clip(np.asarray(img), 0, 1)
    if bit16:
        out = (img * 65535).astype(np.uint16)
    else:
        out = (img * 255).astype(np.uint8)
    if out.ndim == 3:
        out = cv2.cvtColor(out, cv2.COLOR_RGB2BGR)
    cv2.imwrite(path, out)


def write_video(path: str, frames, fps: int = 10):
    """frames: iterable of RGB float [0,1] (h, w, 3)."""
    frames = list(frames)
    h, w = frames[0].shape[:2]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(path, fourcc, fps, (w, h))
    for f in frames:
        writer.write(cv2.cvtColor((np.clip(f, 0, 1) * 255).astype(np.uint8),
                                  cv2.COLOR_RGB2BGR))
    writer.release()


def save_params_npz(path: str, variables: dict, dtype=np.float16):
    """Flatten a variables tree ({"params", "batch_stats"}) into a
    compressed npz of slash-joined keys (float32 leaves downcast)."""
    import jax
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    out = {}
    for kp, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                       for p in kp)
        arr = np.asarray(leaf)
        out[key] = arr.astype(dtype) if arr.dtype == np.float32 else arr
    np.savez_compressed(path, **out)


def load_params_npz(path: str) -> dict:
    """Inverse of save_params_npz: -> nested variables dict (float32)."""
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = data[key]
        node[parts[-1]] = arr.astype(np.float32) \
            if arr.dtype == np.float16 else arr
    return tree
