"""Parity for the fused shared-z MLP tail kernel (ops/pallas/shared_z.py)
against the plain-jnp formulation, and through ResnetFC.call_split_shared.

The kernel is OFF by default (measured slower than XLA's fusion — see the
module docstring); these tests force it on so the scaffold stays correct."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from behindthescenes_tpu.models.mlp import ResnetFC
from behindthescenes_tpu.ops.pallas.shared_z import shared_z_tail


@pytest.fixture(autouse=True)
def _force_kernel(monkeypatch):
    monkeypatch.setenv("BTS_SHARED_Z_PALLAS", "1")


def _ref(hs, hd, w, b):
    x = jnp.maximum(hs[:, None, :] + hd[None, :, :], 0.0)
    return jnp.einsum("bkh,hd->bkd", x.astype(jnp.float32),
                      w.astype(jnp.float32)) + b


def test_kernel_matches_jnp_f32():
    rng = np.random.default_rng(0)
    hs = jnp.asarray(rng.normal(size=(500, 64)), dtype=jnp.float32)
    hd = jnp.asarray(rng.normal(size=(24, 64)), dtype=jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 1)), dtype=jnp.float32)
    b = jnp.asarray(rng.normal(size=(1,)), dtype=jnp.float32)
    got = shared_z_tail(hs, hd, w, b, block=128)   # 500 % 128 != 0: pads
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(hs, hd, w, b)),
                               atol=1e-5)


def test_kernel_matches_jnp_bf16():
    rng = np.random.default_rng(1)
    hs = jnp.asarray(rng.normal(size=(256, 64)), dtype=jnp.bfloat16)
    hd = jnp.asarray(rng.normal(size=(64, 64)), dtype=jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(64, 4)), dtype=jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(4,)), dtype=jnp.float32)
    got = shared_z_tail(hs, hd, w, b)
    ref = _ref(hs, hd, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=0.15, rtol=0.02)


def test_call_split_shared_uses_kernel_and_matches_call():
    """n_blocks=0 ResnetFC: call_split_shared (kernel tail) must equal the
    generic __call__ on the equivalent concatenated input."""
    rng = np.random.default_rng(2)
    b_sz, k_sz, cs, cd = 100, 16, 20, 7
    mlp = ResnetFC(d_out=1, n_blocks=0, d_hidden=32)
    xs = jnp.asarray(rng.normal(size=(b_sz, cs)), dtype=jnp.float32)
    xd = jnp.asarray(rng.normal(size=(k_sz, cd)), dtype=jnp.float32)
    variables = mlp.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, cs + cd)))

    out_split = mlp.apply(variables, xs, xd,
                          method=ResnetFC.call_split_shared)
    full = jnp.concatenate([
        jnp.broadcast_to(xs[:, None, :], (b_sz, k_sz, cs)),
        jnp.broadcast_to(xd[None, :, :], (b_sz, k_sz, cd))],
        axis=-1).reshape(b_sz * k_sz, cs + cd)
    out_full = mlp.apply(variables, full).reshape(b_sz, k_sz, 1)
    np.testing.assert_allclose(np.asarray(out_split), np.asarray(out_full),
                               atol=1e-5)
