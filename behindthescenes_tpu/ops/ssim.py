"""SSIM with the reference's exact window / padding / composition options.

Mirrors reference models/common/model/layers.py:71-150. Channel-last (NHWC);
the 3x3 window runs as a depthwise convolution which XLA maps onto the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 3x3 gaussian window, identical constants to the reference (layers.py:82-85).
_GAUSS3 = np.array(
    [[0.0947, 0.1183, 0.0947],
     [0.1183, 0.1478, 0.1183],
     [0.0947, 0.1183, 0.0947]], dtype=np.float32)

_C1 = 0.01 ** 2
_C2 = 0.03 ** 2


def _depthwise3(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """3x3 depthwise conv, valid padding. x: (N, H, W, C)."""
    c = x.shape[-1]
    kernel = jnp.broadcast_to(window[:, :, None, None], (3, 3, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim(x: jnp.ndarray, y: jnp.ndarray, *,
         pad_reflection: bool = True, gaussian_average: bool = False,
         comp_mode: bool = False, eval_mode: bool = False,
         pad: bool = True) -> jnp.ndarray:
    """SSIM error map. x, y: (N, H, W, C) -> (N, H, W, C).

    Defaults and option semantics follow layers.py:92-150:
      * not eval_mode, not comp_mode: clamp((1 - S) / 2, 0, 1)
      * not eval_mode, comp_mode:     clamp(1 - S, 0, 1) / 2
      * eval_mode:                    S
    """
    if pad:
        mode = "reflect" if pad_reflection else "constant"
        cfg = [(0, 0), (1, 1), (1, 1), (0, 0)]
        x = jnp.pad(x, cfg, mode=mode)
        y = jnp.pad(y, cfg, mode=mode)

    if gaussian_average:
        window = jnp.asarray(_GAUSS3)
    else:
        window = jnp.full((3, 3), 1.0 / 9.0)

    mu_x = _depthwise3(x, window)
    mu_y = _depthwise3(y, window)
    mu_x_sq = mu_x * mu_x
    mu_y_sq = mu_y * mu_y
    mu_xy = mu_x * mu_y

    sigma_x = _depthwise3(x * x, window) - mu_x_sq
    sigma_y = _depthwise3(y * y, window) - mu_y_sq
    sigma_xy = _depthwise3(x * y, window) - mu_xy

    num = (2 * mu_xy + _C1) * (2 * sigma_xy + _C2)
    den = (mu_x_sq + mu_y_sq + _C1) * (sigma_x + sigma_y + _C2)
    s = num / den

    if eval_mode:
        return s
    if comp_mode:
        return jnp.clip(1.0 - s, 0.0, 1.0) * 0.5
    return jnp.clip((1.0 - s) * 0.5, 0.0, 1.0)
