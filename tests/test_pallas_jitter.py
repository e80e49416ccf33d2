"""Parity of the fused stratified-jitter density kernel
(ops/pallas/jitter_density.py) against the jnp formulation it replaces and
against the module path (BTSNet.query_selfview_density)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from behindthescenes_tpu.ops.pallas.jitter_density import (
    interleave_to_grouped, jitter_density_jnp, jitter_density_pallas)

N_FREQS = 6
FREQ_FACTOR = 1.5


def _rand_inputs(b=640, k=16, h=64, seed=0):
    rng = np.random.default_rng(seed)
    coord = jnp.asarray(rng.uniform(-1, 1, (b, k)), jnp.float32)
    h_static = jnp.asarray(rng.normal(0, 0.5, (b, h)), jnp.float32)
    w_d = jnp.asarray(rng.normal(0, 0.3, (13, h)), jnp.float32)
    b_in = jnp.asarray(rng.normal(0, 0.1, (h,)), jnp.float32)
    w_out = jnp.asarray(rng.normal(0, 0.3, (h, 1)), jnp.float32)
    b_out = jnp.float32(0.07)
    return coord, h_static, w_d, b_in, w_out, b_out


def test_interleave_perm_layout():
    # Permutation maps [id, s1, c1, s2, c2, ...] -> [id, s1..sF, c1..cF].
    perm = interleave_to_grouped(3)
    assert perm.tolist() == [0, 1, 3, 5, 2, 4, 6]


def test_kernel_matches_jnp():
    args = _rand_inputs()
    ref = jitter_density_jnp(*args, n_freqs=N_FREQS,
                             freq_factor=FREQ_FACTOR)
    out = jitter_density_pallas(*args, n_freqs=N_FREQS,
                                freq_factor=FREQ_FACTOR, block=256,
                                interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_kernel_matches_jnp_vpu_proj_variant():
    """The VPU segment-reduce projection variant (vpu_proj=True —
    measured on chip: a wash vs the MXU dot, kept as a parity-tested
    alternative; PERF.md kernel index) must match the jnp reference."""
    rng = np.random.default_rng(5)
    B, K, H = 513, 16, 64
    coord = jnp.asarray(rng.uniform(-1, 1, (B, K)), jnp.float32)
    hs = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    wd = jnp.asarray(rng.normal(size=(13, H)) * 0.3, jnp.float32)
    b_in = jnp.asarray(rng.normal(size=(H,)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.normal(size=(H, 1)) * 0.3, jnp.float32)
    ref = jitter_density_jnp(coord, hs, wd, b_in, w_out, 0.2,
                             n_freqs=N_FREQS, freq_factor=FREQ_FACTOR)
    out = jitter_density_pallas(coord, hs, wd, b_in, w_out, 0.2,
                                n_freqs=N_FREQS, freq_factor=FREQ_FACTOR,
                                interpret=True, vpu_proj=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_kernel_matches_jnp_unpadded_vs_padded():
    # B not a multiple of the block: the pad/slice must not leak.
    args = _rand_inputs(b=500, k=8)
    ref = jitter_density_jnp(*args, n_freqs=N_FREQS,
                             freq_factor=FREQ_FACTOR)
    out = jitter_density_pallas(*args, n_freqs=N_FREQS,
                                freq_factor=FREQ_FACTOR, block=256,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_flag_is_consumed(monkeypatch):
    """jitter_kernel_enabled() must actually read BTS_JITTER_PALLAS."""
    import pytest
    from behindthescenes_tpu.ops.pallas import jitter_density as jd
    for val in ("1", "true", "ON", "yes"):
        monkeypatch.setenv("BTS_JITTER_PALLAS", val)
        assert jd.jitter_kernel_enabled() is True, val
    for val in ("0", "false", "off", "NO"):
        monkeypatch.setenv("BTS_JITTER_PALLAS", val)
        assert jd.jitter_kernel_enabled() is False, val
    # A typo must raise, not silently invert the on-TPU default.
    monkeypatch.setenv("BTS_JITTER_PALLAS", "enabled")
    with pytest.raises(ValueError):
        jd.jitter_kernel_enabled()


def test_module_path_parity(monkeypatch):
    """query_selfview_density with the kernel ON vs OFF (jittered z).

    The ON run must actually reach jitter_density_pallas (counted via a
    wrap), so this fails — not silently passes — if the dispatch in
    BTSNet.query_selfview_density stops consuming the flag."""
    from behindthescenes_tpu.models.bts import BTSNet
    from behindthescenes_tpu.ops.pallas import jitter_density as jd

    h, w = 24, 32
    model_conf = {
        "z_near": 3.0, "z_far": 80.0, "inv_z": True, "code_mode": "z",
        "learn_empty": False,
        "code": {"num_freqs": N_FREQS, "freq_factor": FREQ_FACTOR,
                 "include_input": True},
        "encoder": {"type": "monodepth2", "resnet_layers": 18,
                    "num_ch_dec": [32, 32, 64, 128, 256], "d_out": 16,
                    "scales": [0]},
        "mlp_coarse": {"type": "resnet", "n_blocks": 0, "d_hidden": 64},
        "mlp_fine": {"type": "empty"},
    }
    net = BTSNet.from_conf(model_conf, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 2, h, w, 3)), jnp.float32)
    poses = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4))
    projs = jnp.broadcast_to(jnp.asarray(
        [[0.6, 0, 0], [0, 1.8, 0], [0, 0, 1]], jnp.float32), (1, 2, 3, 3))
    variables = net.init(jax.random.PRNGKey(0), images, projs, poses,
                         jnp.zeros((1, 8, 3)))
    grid = net.apply(variables, images, projs, poses, ids_encoder=[0],
                     ids_render=[0], method=BTSNet.encode)
    z_samp = jnp.asarray(rng.uniform(3.0, 80.0, (h * w, 16)), jnp.float32)

    def run():
        return net.apply(variables, grid, z_samp, scale=0, out_hw=(h, w),
                         method=BTSNet.query_selfview_density)

    monkeypatch.setenv("BTS_JITTER_PALLAS", "0")
    ref = run()

    calls = {"n": 0}
    real = jd.jitter_density_pallas

    def counted(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs)

    monkeypatch.setattr(jd, "jitter_density_pallas", counted)
    monkeypatch.setenv("BTS_JITTER_PALLAS", "1")
    on = run()   # forced kernel path (interpret mode off-TPU)
    assert calls["n"] == 1, "kernel path was not dispatched with flag on"
    np.testing.assert_allclose(np.asarray(on), np.asarray(ref),
                               atol=2e-2, rtol=3e-2)

    # f32-configured models must NOT dispatch even with the flag forced:
    # the kernel's matmuls are bf16, and silently downcasting an
    # f32-numerics model (bf16: false) is a correctness gap — the jnp
    # path keeps f32 (models/bts.py dispatch dtype gate).
    net32 = BTSNet.from_conf(model_conf)          # compute_dtype=f32
    variables32 = net32.init(jax.random.PRNGKey(0), images, projs, poses,
                             jnp.zeros((1, 8, 3)))
    grid32 = net32.apply(variables32, images, projs, poses, ids_encoder=[0],
                         ids_render=[0], method=BTSNet.encode)
    calls["n"] = 0
    net32.apply(variables32, grid32, z_samp, scale=0, out_hw=(h, w),
                method=BTSNet.query_selfview_density)
    assert calls["n"] == 0, "f32 model dispatched the bf16 kernel"
