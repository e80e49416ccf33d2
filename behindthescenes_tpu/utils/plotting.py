"""Plotting helpers (reference utils/plotting.py): colormap application and
image grid assembly (torchvision make_grid equivalent)."""
from __future__ import annotations

import numpy as np


def color_tensor(tensor: np.ndarray, cmap: str = "plasma",
                 norm: bool = False) -> np.ndarray:
    """Map a (..., h, w) array in [0,1] to RGB via a matplotlib colormap
    (reference utils/plotting.py:41-46). Returns (..., h, w, 3)."""
    import matplotlib
    if norm:
        lo, hi = tensor.min(), tensor.max()
        tensor = (tensor - lo) / max(hi - lo, 1e-8)
    cm = matplotlib.colormaps[cmap]
    return cm(np.clip(np.asarray(tensor), 0, 1))[..., :3]


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """Tile (n, h, w, 3) images into one grid image (h', w', 3)."""
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nrow_ = (n + ncol - 1) // ncol
    grid = np.full((nrow_ * (h + padding) + padding,
                    ncol * (w + padding) + padding, c), pad_value,
                   dtype=images.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y:y + h, x:x + w] = images[i]
    return grid
