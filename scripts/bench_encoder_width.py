"""MXU channel-width experiment (PERF.md finding 9): the flagship U-Net
decoder's 32/64-wide convs use half the 128-lane MXU. Measures full encode
forward (and train-mode fwd+bwd) for the flagship decoder widths vs a
128-padded variant at 192x640 on the real chip, marginal timing.

Usage: python scripts/bench_encoder_width.py
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

from behindthescenes_tpu.models.encoder import make_backbone

H, W = 192, 640

VARIANTS = {
    "flagship (32,32,64,128,256)": (32, 32, 64, 128, 256),
    "padded   (128,128,128,128,256)": (128, 128, 128, 128, 256),
}


def marginal(jf, args, n_lo=4, n_hi=24, reps=5):
    lo, hi = jnp.int32(n_lo), jnp.int32(n_hi)
    float(jf(*args, lo))
    float(jf(*args, hi))

    def t(n):
        t0 = time.perf_counter()
        float(jf(*args, n))
        return time.perf_counter() - t0

    ts = [(t(lo), t(hi)) for _ in range(reps)]
    return (np.median([b for _, b in ts]) - np.median([a for a, _ in ts])) \
        / (n_hi - n_lo)


def bench_variant(name, num_ch_dec):
    conf = {"type": "monodepth2", "resnet_layers": 50,
            "num_ch_dec": list(num_ch_dec), "d_out": 64, "scales": [0]}
    net = make_backbone(conf, compute_dtype=jnp.bfloat16)
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), img)
    params = variables["params"]
    bstats = variables["batch_stats"]
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))

    def fwd_loop(params, bstats, img, n):
        def body(i, acc):
            # Salt the (small relative to conv work) input; full reduce of
            # the output so XLA cannot slice the convs (PERF.md traps).
            out = net.apply({"params": params, "batch_stats": bstats},
                            img + acc * 1e-12)
            return acc + jnp.sum(out[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def train_loop(params, bstats, img, n):
        def loss_fn(p, salt):
            out, _ = net.apply({"params": p, "batch_stats": bstats},
                               img + salt, train=True,
                               mutable=["batch_stats"])
            return jnp.sum(out[0].astype(jnp.float32))

        def body(i, acc):
            loss, grads = jax.value_and_grad(loss_fn)(params, acc * 1e-12)
            return acc + loss * 1e-20 + jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b).astype(jnp.float32), grads,
                jnp.float32(0.0)) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t_fwd = marginal(jax.jit(fwd_loop), (params, bstats, img))
    t_bwd = marginal(jax.jit(train_loop), (params, bstats, img),
                     n_lo=2, n_hi=12)
    print(f"{name:34s} fwd {t_fwd * 1e3:7.2f} ms   fwd+bwd "
          f"{t_bwd * 1e3:7.2f} ms   ({n_params / 1e6:.1f}M params)")
    return t_fwd, t_bwd


def main():
    print(f"encode width sweep @ {H}x{W}, rn50, bf16, marginal timing")
    for name, widths in VARIANTS.items():
        bench_variant(name, widths)


if __name__ == "__main__":
    main()
