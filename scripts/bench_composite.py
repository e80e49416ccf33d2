"""A/B microbench: alpha-composite weight computation variants on TPU.

`weights_from_sigma` is 1.06 ms/frame (bench_stages) — MORE than the
shared-z density query it follows (0.63 ms). Hypothesis: jnp.cumprod
lowers to a log-depth associative scan = log2(K) full HBM passes over the
(rays, K) tensor. Candidates:

  a) cumprod          — current renderer implementation
  b) logmatmul        — transmittance = exp(cumsum(log(.))) with the
                        cumsum computed as a single (rays,K)x(K,K)
                        triangular matmul on the otherwise-idle MXU;
                        one fused elementwise pass around one tiny matmul
  c) logcumsum        — exp(jnp.cumsum(log(.))) (still a scan; isolates
                        the log-space transform from the matmul trick)

Usage: python scripts/bench_composite.py
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

from bench import H, W, N_COARSE, marginal_time

K = N_COARSE
HW = H * W


def alphas_from(sigma, deltas):
    alphas = 1.0 - jnp.exp(-jnp.abs(deltas) * jax.nn.relu(sigma))
    alphas = alphas.at[..., -1].set(1.0)   # hard_alpha_cap
    return alphas


def weights_cumprod(sigma, deltas):
    alphas = alphas_from(sigma, deltas)
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-10], axis=-1)
    transmittance = jnp.cumprod(shifted, axis=-1)
    return alphas * transmittance[..., :-1]


def weights_logmatmul(sigma, deltas):
    alphas = alphas_from(sigma, deltas)
    log_terms = jnp.log(1.0 - alphas + 1e-10)
    # Exclusive cumsum along K as one matmul with strictly-lower-triangular
    # ones: out[k] = sum_{j<k} log_terms[j].
    tri = jnp.tril(jnp.ones((K, K), dtype=log_terms.dtype), k=-1)
    csum = jnp.matmul(log_terms, tri.T, precision="highest")
    return alphas * jnp.exp(csum)


def weights_logcumsum(sigma, deltas):
    alphas = alphas_from(sigma, deltas)
    log_terms = jnp.log(1.0 - alphas + 1e-10)
    csum = jnp.cumsum(log_terms, axis=-1) - log_terms  # exclusive
    return alphas * jnp.exp(csum)


def main():
    rng = np.random.default_rng(0)
    sigma = jnp.asarray(rng.uniform(0, 2, (HW, K)), dtype=jnp.float32)
    z = jnp.sort(jnp.asarray(rng.uniform(3, 80, (HW, K)),
                             dtype=jnp.float32), axis=-1)
    deltas = jnp.concatenate(
        [z[..., 1:] - z[..., :-1], jnp.full((HW, 1), 1e10)], axis=-1)

    variants = {"cumprod  ": weights_cumprod,
                "logmatmul": weights_logmatmul,
                "logcumsum": weights_logcumsum}

    ref = np.asarray(weights_cumprod(sigma, deltas))
    for name, fn in variants.items():
        got = np.asarray(fn(sigma, deltas))
        err = np.abs(got - ref).max()

        def looped(s, d, zz, n, fn=fn):
            def body(i, acc):
                w = fn(s + acc * 1e-20, d)
                return acc + jnp.sum(w * zz)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        t = marginal_time(jax.jit(looped), (sigma, deltas, z), 10, 60)
        print(f"{name}: {t * 1e3:6.3f} ms/frame   max|dw|={err:.2e}")


if __name__ == "__main__":
    main()
