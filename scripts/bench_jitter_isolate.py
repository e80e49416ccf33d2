"""Decompose the jitter-density kernel's 2.1 ms into irreducible vs
overhead terms (VERDICT r4 ask #5).

Three probes on the kernel's fused scope at the flagship frame shape
(122880 rays), marginal timing throughout:

  1. K-marginal: time the kernel at K=64 vs K=32 — the slope is the
     per-sample cost (code + matmuls + relu + projection, the work that
     scales with jittered samples), the intercept is per-frame/per-block
     overhead (Mosaic grid serialization, h_static/weights loads).
  2. sin/cos ablation (ablate_code=True: identical shapes and matmuls,
     transcendentals replaced by copies) — prices the VPU sin/cos share.
  3. jnp reference at the same scopes for context.

Usage: python scripts/bench_jitter_isolate.py
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

from behindthescenes_tpu.ops.pallas.jitter_density import (
    interleave_to_grouped, jitter_density_pallas)

B = 192 * 640
H = 64
N_FREQS = 6
FREQ_FACTOR = 1.5
ITERS = (4, 24)


def timeit(name, fn, *args):
    def looped(n, *a):
        def body(i, acc):
            return acc + fn(*a, salt=acc * 1e-12)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jf = jax.jit(looped)
    lo, hi = jnp.int32(ITERS[0]), jnp.int32(ITERS[1])
    float(jf(lo, *args))
    float(jf(hi, *args))

    def t(n):
        t0 = time.perf_counter()
        float(jf(n, *args))
        return time.perf_counter() - t0

    ts = [(t(lo), t(hi)) for _ in range(4)]
    ms = (np.median([b for _, b in ts]) - np.median([a for a, _ in ts])) \
        / (ITERS[1] - ITERS[0]) * 1e3
    print(f"{name:46s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    rng = np.random.default_rng(0)
    h_static = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    w_d = jnp.asarray(rng.normal(size=(13, H)) * 0.1, jnp.float32)
    b_in = jnp.asarray(rng.normal(size=(H,)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.normal(size=(H, 1)) * 0.1, jnp.float32)
    b_out = jnp.float32(0.1)
    coords = {k: jnp.asarray(rng.uniform(-1, 1, (B, k)), jnp.float32)
              for k in (32, 64)}

    interpret = jax.default_backend() != "tpu"

    results = {}
    for k in (64, 32):
        def kern(c, salt=0.0, ab=False):
            out = jitter_density_pallas(
                c + salt, h_static, w_d, b_in, w_out, b_out,
                n_freqs=N_FREQS, freq_factor=FREQ_FACTOR,
                interpret=interpret, ablate_code=ab)
            return jnp.sum(out) * 1e-9
        results[k] = timeit(f"kernel K={k}", kern, coords[k])
    results["ablate64"] = timeit(
        "kernel K=64 ablate_code (no sin/cos)",
        lambda c, salt=0.0: jnp.sum(jitter_density_pallas(
            c + salt, h_static, w_d, b_in, w_out, b_out, n_freqs=N_FREQS,
            freq_factor=FREQ_FACTOR, interpret=interpret,
            ablate_code=True)) * 1e-9,
        coords[64])

    slope = (results[64] - results[32]) / 32.0
    intercept = results[64] - slope * 64
    sincos = results[64] - results["ablate64"]
    print(f"\nper-sample slope: {slope * 1e3:.2f} us/K "
          f"({slope * 64:.3f} ms of K=64 scales with samples)")
    print(f"per-frame intercept (grid serialization + static loads): "
          f"{intercept:.3f} ms")
    print(f"sin/cos transcendental share at K=64: {sincos:.3f} ms")


if __name__ == "__main__":
    main()
