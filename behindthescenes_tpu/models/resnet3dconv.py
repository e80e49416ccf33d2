"""3D-conv residual blocks (reference models/common/model/resnet3dconv.py —
present in the reference's model zoo, unused by the shipped BTS configs).
Channel-last (N, D, H, W, C) for TPU-friendly conv layouts.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

_kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class ResnetBlock3DConv(nn.Module):
    """Residual 3D-conv block; second conv zero-initialized so the block
    starts as identity (DVR-style, like ResnetBlockFC)."""
    size_out: Optional[int] = None
    size_h: Optional[int] = None
    beta: float = 0.0
    kernel_size: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        size_in = x.shape[-1]
        size_out = self.size_out or size_in
        size_h = self.size_h or min(size_in, size_out)
        act = (lambda v: nn.softplus(self.beta * v) / self.beta) \
            if self.beta > 0 else nn.relu
        k = (self.kernel_size,) * 3
        s = (self.stride,) * 3
        pad = "SAME" if self.kernel_size > 1 else "VALID"

        net = nn.Conv(size_h, k, strides=s, padding=pad,
                      kernel_init=_kaiming, name="conv_0")(act(x))
        dx = nn.Conv(size_out, k, strides=s, padding=pad,
                     kernel_init=nn.initializers.zeros, name="conv_1")(
                         act(net))
        if size_in == size_out and self.stride == 1:
            x_s = x
        else:
            x_s = nn.Conv(size_out, k, strides=s, padding=pad,
                          use_bias=False, kernel_init=_kaiming,
                          name="shortcut")(x)
        return x_s + dx


class Resnet3DConv(nn.Module):
    """Stack of 3D-conv residual blocks over a voxel feature grid."""
    n_blocks: int = 3
    d_hidden: int = 64
    d_out: int = 4
    beta: float = 0.0

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.d_hidden, (1, 1, 1), name="conv_in")(x)
        for i in range(self.n_blocks):
            x = ResnetBlock3DConv(beta=self.beta, name=f"block_{i}")(x)
        act = (lambda v: nn.softplus(self.beta * v) / self.beta) \
            if self.beta > 0 else nn.relu
        return nn.Conv(self.d_out, (1, 1, 1), name="conv_out")(act(x))
