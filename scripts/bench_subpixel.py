"""Microbench: full-res narrow convs vs phase-space (subpixel) equivalents.

The flagship decoder's level-0 pair — upconv_0_1 (3x3, 64->64 on 192x640,
input = nearest-upsample of a 96x320 map) and dispconv_0 (3x3, 64->64 on
192x640) — are its FLOPs bulk at the worst MXU shapes (64-wide channels).
Both have exact low-res phase-space forms:
  * conv3x3 on upsample2x(x)  ==  conv3x3 on x emitting 4 phases (256 ch)
    with a kernel assembled from tap sums (same FLOPs, N: 64 -> 256)
  * conv3x3 at full res       ==  block conv3x3 on the 4-phase tensor
    (4x FLOPs, 25% dense kernel, but K=2304/N=256 MXU shapes)
This script measures the raw shapes (random weights, zero-pad) to decide
whether the exact rewrite is worth implementing.

Usage: python scripts/bench_subpixel.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from behindthescenes_tpu.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from bench import marginal_time

H, W, C = 96, 320, 64


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    x_lo = jnp.asarray(rng.normal(size=(1, H, W, C)), dtype=jnp.bfloat16)

    w1 = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, jnp.bfloat16)
    w1p = jnp.asarray(rng.normal(size=(3, 3, C, 4 * C)) * 0.05, jnp.bfloat16)
    w2b = jnp.asarray(rng.normal(size=(3, 3, 4 * C, 4 * C)) * 0.05,
                      jnp.bfloat16)

    def baseline(x, n):
        # nearest-upsample -> conv3x3 64ch -> ELU -> conv3x3 64ch
        def body(i, acc):
            xi = x + acc.astype(x.dtype) * 1e-9
            up = jnp.repeat(jnp.repeat(xi, 2, axis=1), 2, axis=2)
            y = jax.nn.elu(conv(up, w1))
            z = conv(y, w2)
            return acc + jnp.sum(z.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def phase(x, n):
        # conv3x3 -> 4C phases at low res -> ELU -> block conv3x3 4C->4C
        def body(i, acc):
            xi = x + acc.astype(x.dtype) * 1e-9
            y = jax.nn.elu(conv(xi, w1p))
            z = conv(y, w2b)
            return acc + jnp.sum(z.astype(jnp.float32)) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    for name, fn in (("baseline (2x full-res 64ch convs)", baseline),
                     ("phase    (low-res 256ch convs)   ", phase)):
        t = marginal_time(jax.jit(fn), (x_lo,), 10, 60)
        print(f"{name}: {t * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
