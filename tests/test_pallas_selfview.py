"""Pallas fused self-view density kernel: parity vs the jnp reference in
interpreter mode (CPU). On-chip parity (6e-6) is checked in the perf
workflow; here we pin the math."""
import jax
import jax.numpy as jnp
import numpy as np

from behindthescenes_tpu.ops.pallas.selfview import selfview_density_fused


def test_selfview_kernel_parity_interpret():
    HW, K, F = 256, 32, 6
    rng = np.random.default_rng(0)
    h_static = jnp.asarray(rng.standard_normal((HW, 64)).astype(np.float32))
    coord = jnp.asarray(rng.uniform(-1, 1, (HW, K)).astype(np.float32))
    w_z = jnp.asarray(rng.standard_normal((13, 64)).astype(np.float32) * .2)
    b_in = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 0.1)
    w_out = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 0.2)
    b_out = 0.05

    freqs = 1.5 * 2.0 ** np.arange(F)
    sc = coord[..., None] * freqs
    x = jnp.concatenate([coord[..., None], jnp.sin(sc), jnp.cos(sc)], -1)
    h = jax.nn.relu(jnp.dot(x, w_z, precision="highest")
                    + h_static[:, None, :] + b_in)
    expected = np.asarray(jax.nn.softplus(jnp.sum(h * w_out, -1) + b_out))

    got = np.asarray(selfview_density_fused(
        h_static, coord, w_z, b_in, w_out, b_out, k_samples=K,
        interpret=True))
    np.testing.assert_allclose(got, expected, atol=3e-5)
