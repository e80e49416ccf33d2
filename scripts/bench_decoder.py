"""Decoder conv micro-probes at flagship shapes (192x640, rn50 skips).

Times each U-Net decoder level and isolates pad/layout/width effects to find
where the 2.5 ms decoder time goes. Loop-inside-jit methodology (PERF.md).

Usage: python scripts/bench_decoder.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from behindthescenes_tpu.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp
import flax.linen as nn

N_ITERS = 50
DT = jnp.bfloat16


def timeit(name, fn, *args, iters=N_ITERS, flops=None):
    def looped(*a):
        def body(i, acc):
            out = fn(*a, salt=acc * 1e-6)
            return acc + out
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    jf = jax.jit(looped)
    float(jf(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jf(*args))
        times.append(time.perf_counter() - t0)
    ms = np.median(times) / iters * 1e3
    tf = f"  {flops / (ms / 1e3) / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:52s} {ms:8.3f} ms{tf}")
    return ms


def conv_reflect(x, w, salt=0.0):
    # salt the WEIGHT (tiny) so each loop iteration is fresh without
    # materializing a copy of the large activation.
    w = w + jnp.asarray(salt, w.dtype)
    x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.sum(nn.elu(y).astype(jnp.float32))


def conv_same(x, w, salt=0.0):
    y = jax.lax.conv_general_dilated(
        x, w + jnp.asarray(salt, w.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.sum(nn.elu(y).astype(jnp.float32))


def main():
    rng = np.random.default_rng(0)

    def mk(shape):
        return jnp.asarray(rng.normal(size=shape), dtype=DT)

    # flagship decoder levels: (h, w, cin, cout) for upconv_i_1 (the big
    # post-concat convs) and the full-res tail.
    levels = [
        ("lvl4 12x40 1280->256", 12, 40, 1280, 256),
        ("lvl3 24x80 640->128", 24, 80, 640, 128),
        ("lvl2 48x160 320->64", 48, 160, 320, 64),
        ("lvl1 96x320 128->64", 96, 320, 128, 64),
        ("lvl0a 96x320 64->64 (upconv_0_0)", 96, 320, 64, 64),
        ("lvl0b 192x640 64->64 (upconv_0_1)", 192, 640, 64, 64),
        ("disp0 192x640 64->64 (dispconv)", 192, 640, 64, 64),
    ]
    total = 0.0
    for name, h, w, cin, cout in levels:
        x = mk((1, h, w, cin))
        wgt = mk((3, 3, cin, cout))
        fl = 2 * h * w * cin * cout * 9
        total += timeit(f"{name} reflect", conv_reflect, x, wgt, flops=fl)
    print(f"{'sum of conv levels':52s} {total:8.3f} ms")

    # isolate effects on the dominant full-res conv
    h, w, cin, cout = 192, 640, 64, 64
    x = mk((1, h, w, cin))
    wgt = mk((3, 3, cin, cout))
    fl = 2 * h * w * cin * cout * 9
    timeit("192x640 64->64 SAME (no reflect pad)", conv_same, x, wgt,
           flops=fl)
    wgt128 = mk((3, 3, cin, 128))
    timeit("192x640 64->128 SAME (lane-full N)", conv_same, x, wgt128,
           flops=2 * fl)
    x128 = mk((1, h, w, 128))
    wgt1288 = mk((3, 3, 128, 128))
    timeit("192x640 128->128 SAME", conv_same, x128, wgt1288,
           flops=4 * fl)
    xf = x.astype(jnp.float32)
    wf = wgt.astype(jnp.float32)
    timeit("192x640 64->64 SAME f32", conv_same, xf, wf, flops=fl)
    # batch the n*v frames dimension (encode runs nv frames at once)
    xb = mk((4, h, w, cin))
    timeit("192x640 64->64 SAME batch4", conv_same, xb, wgt, flops=4 * fl)

    # matmul-form equivalent FLOPs: is the MXU itself the limit?
    a = mk((122880, 576))
    b = mk((576, 64))

    def mm(a, b, salt=0.0):
        return jnp.sum((a @ (b + jnp.asarray(salt, b.dtype))).astype(jnp.float32))

    timeit("matmul 122880x576x64 (im2col equiv)", mm, a, b, flops=fl)
    b128 = mk((576, 128))
    timeit("matmul 122880x576x128", mm, a, b128, flops=2 * fl)


if __name__ == "__main__":
    main()
