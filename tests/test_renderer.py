"""Renderer tests: analytic compositing fixtures + sampling invariants."""
import jax
import jax.numpy as jnp
import numpy as np

from behindthescenes_tpu import renderer as rlib


def _wall_query(wall_z=5.0, sigma_val=1e4):
    """Opaque wall at z=wall_z for axis-aligned rays."""
    def query_fn(xyz, coarse):
        n, p, _ = xyz.shape
        sigma = jnp.where(xyz[..., 2:3] >= wall_z, sigma_val, 0.0)
        rgb = jnp.broadcast_to(jnp.asarray([1.0, 0.5, 0.25]), (n, p, 3))
        invalid = jnp.zeros((n, p, 1))
        return rgb, invalid, sigma
    return query_fn


def _axis_rays(b=8, near=1.0, far=10.0):
    rays = np.zeros((1, b, 8), dtype=np.float32)
    rays[..., 3:6] = [0, 0, 1]
    rays[..., 6] = near
    rays[..., 7] = far
    return jnp.asarray(rays)


def test_composite_wall_depth():
    rays = _axis_rays()
    cfg = rlib.RendererConfig(n_coarse=256, lindisp=False,
                              hard_alpha_cap=False)
    z = rlib.sample_coarse(jax.random.PRNGKey(0), rays, cfg.n_coarse,
                           cfg.lindisp)
    out = rlib.composite(_wall_query(), rays, z, cfg)
    depth = np.asarray(out["depth"])
    # Depth lands on the first stratified sample past the wall: error is
    # bounded by ~2 bins = 2 * (far-near)/K = 0.07.
    assert np.all(depth >= 5.0 - 1e-4) and np.all(depth <= 5.0 + 0.08), depth
    rgb = np.asarray(out["rgb"])
    np.testing.assert_allclose(
        rgb, np.broadcast_to(np.array([1.0, 0.5, 0.25]), rgb.shape),
        atol=1e-3)
    w = np.asarray(out["weights"])
    assert np.all(w.sum(-1) <= 1.0 + 1e-5)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-3)


def test_composite_empty_space_hard_alpha_cap():
    rays = _axis_rays(near=1.0, far=4.0)  # wall at 5 is beyond far

    def empty_query(xyz, coarse):
        n, p, _ = xyz.shape
        return (jnp.zeros((n, p, 3)), jnp.zeros((n, p, 1)),
                jnp.zeros((n, p, 1)))

    cfg = rlib.RendererConfig(n_coarse=32, hard_alpha_cap=True)
    z = rlib.sample_coarse(jax.random.PRNGKey(0), rays, 32, False)
    out = rlib.composite(empty_query, rays, z, cfg)
    # hard_alpha_cap forces the last sample opaque: weights sum to 1, depth
    # collapses to the last z sample.
    np.testing.assert_allclose(np.asarray(out["weights"]).sum(-1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]),
                               np.asarray(z[..., -1]), atol=1e-5)


def test_sample_coarse_within_bounds_sorted():
    rays = _axis_rays(near=2.0, far=9.0)
    for lindisp in (False, True):
        z = rlib.sample_coarse(jax.random.PRNGKey(1), rays, 64, lindisp)
        zn = np.asarray(z)
        assert zn.min() >= 2.0 - 1e-5 and zn.max() <= 9.0 + 1e-5
        assert np.all(np.diff(zn, axis=-1) > 0)  # stratified => sorted


def test_sample_fine_concentrates_on_peak():
    rays = _axis_rays(b=4)
    k = 64
    weights = np.zeros((1, 4, k), dtype=np.float32)
    weights[..., 40] = 1.0  # all mass in bin 40
    z = rlib.sample_fine(jax.random.PRNGKey(2), rays,
                         jnp.asarray(weights), 32, k, False)
    # bin 40 of [1,10] span: z in [1 + 9*40/64, 1 + 9*41/64]
    zn = np.asarray(z)
    lo, hi = 1 + 9 * 40 / 64, 1 + 9 * 41 / 64
    frac_in = ((zn >= lo - 0.2) & (zn <= hi + 0.2)).mean()
    assert frac_in > 0.95


def test_render_rays_full_pipeline_with_fine():
    rays = _axis_rays()
    cfg = rlib.RendererConfig(n_coarse=32, n_fine=16, n_fine_depth=4,
                              depth_std=0.1, hard_alpha_cap=True,
                              lindisp=False)
    out = rlib.render_rays(_wall_query(), rays, jax.random.PRNGKey(3), cfg,
                           want_weights=True, want_alphas=True,
                           want_z_samps=True, want_rgb_samps=True)
    assert "fine" in out
    assert out["coarse"]["weights"].shape == (1, 8, 32)
    assert out["fine"]["weights"].shape == (1, 8, 32 + 16)
    # Coarse bins are (10-1)/32 = 0.28 wide; importance sampling tightens
    # around the wall but depth still lands on the first sample past it.
    np.testing.assert_allclose(np.asarray(out["fine"]["depth"]), 5.0,
                               atol=0.35)
    # z_samps sorted in fine pass
    zf = np.asarray(out["fine"]["z_samps"])
    assert np.all(np.diff(zf, axis=-1) >= 0)


def test_sample_scheduler():
    cfg = rlib.RendererConfig(n_coarse=64, n_fine=0,
                              sched=((10, 20), (32, 16), (8, 4)))
    sch = rlib.SampleScheduler(cfg)
    assert sch.step(5).n_coarse == 64
    assert sch.step(5).n_coarse == 32   # hits iter 10
    assert sch.step(10).n_coarse == 16  # hits iter 20
    assert sch.step(100).n_coarse == 16
    state = sch.state_dict()
    sch2 = rlib.SampleScheduler(cfg)
    sch2.load_state_dict(state)
    assert sch2.last_sched == 2


def test_weights_matmul_matches_cumprod_and_grads():
    """The log-space triangular-matmul transmittance (TPU: one MXU pass
    instead of a log2(K)-pass cumprod scan — PERF.md) must match the
    reference cumprod semantics (nerf.py:283-294) in values AND gradients."""
    cfg = rlib.RendererConfig(n_coarse=16, n_fine=0, lindisp=False,
                              hard_alpha_cap=True)
    rng = np.random.default_rng(3)
    sigma = jnp.asarray(rng.uniform(0, 3, (64, 16)), dtype=jnp.float32)
    z = jnp.sort(jnp.asarray(rng.uniform(1, 40, (64, 16)),
                             dtype=jnp.float32), axis=-1)

    def weights_cumprod(sig):
        deltas = z[..., 1:] - z[..., :-1]
        deltas = jnp.concatenate(
            [deltas, jnp.full_like(deltas[..., :1], 1e10)], axis=-1)
        alphas = 1.0 - jnp.exp(-jnp.abs(deltas) * jax.nn.relu(sig))
        alphas = alphas.at[..., -1].set(1.0)
        shifted = jnp.concatenate(
            [jnp.ones_like(alphas[..., :1]), 1.0 - alphas + 1e-10], axis=-1)
        return alphas * jnp.cumprod(shifted, axis=-1)[..., :-1]

    w, _ = rlib.weights_from_sigma(sigma, z, cfg)
    np.testing.assert_allclose(np.asarray(w), np.asarray(weights_cumprod(sigma)),
                               atol=2e-5)
    g_new = jax.grad(lambda s: jnp.sum(
        rlib.weights_from_sigma(s, z, cfg)[0] * z))(sigma)
    g_ref = jax.grad(lambda s: jnp.sum(weights_cumprod(s) * z))(sigma)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-4)


def test_weights_saturated_alphas_finite_under_jit():
    """Regression: XLA folds (1 - a) + 1e-10 into 1.0 - a under jit, so a
    saturated interior alpha (huge sigma) hit log(0) = -inf and the 0-entry
    triangular matmul turned the whole ray NaN. The clamp formulation must
    stay finite both eager and jitted."""
    cfg = rlib.RendererConfig(n_coarse=12, n_fine=0, lindisp=False,
                              hard_alpha_cap=True)
    rng = np.random.default_rng(0)
    sigma = jnp.asarray(np.where(rng.uniform(size=(128, 12)) < 0.4,
                                 1e5, 0.7), dtype=jnp.float32)
    z = jnp.sort(jnp.asarray(rng.uniform(1, 40, (128, 12)),
                             dtype=jnp.float32), axis=-1)
    w_eager, a = rlib.weights_from_sigma(sigma, z, cfg)
    w_jit, _ = jax.jit(rlib.weights_from_sigma, static_argnums=2)(
        sigma, z, cfg)
    assert int((np.asarray(a)[:, :-1] == 1.0).sum()) > 0  # saturation real
    assert np.isfinite(np.asarray(w_eager)).all()
    assert np.isfinite(np.asarray(w_jit)).all()
    np.testing.assert_allclose(np.asarray(w_jit), np.asarray(w_eager),
                               atol=1e-6)
    # Weights of a hard-cap ray still sum to 1.
    np.testing.assert_allclose(np.asarray(w_jit.sum(-1)), 1.0, atol=1e-5)


def _smooth_query(v=2):
    """Smooth xyz-dependent density + per-view rgb — order bugs in the
    merged composite show up as depth/rgb drift."""
    def query_fn(xyz, coarse):
        n, p, _ = xyz.shape
        z = xyz[..., 2:3]
        sigma = 0.8 * jax.nn.sigmoid(2.0 * (z - 4.0)) + 0.05 * jnp.sin(z)
        rgb = jnp.concatenate(
            [jnp.sin(0.7 * z + i) * 0.5 + 0.5 for i in range(v)] * 3,
            axis=-1).reshape(n, p, 3 * v)
        invalid = (jnp.sin(3.0 * z) > 0.9).astype(jnp.float32)
        invalid = jnp.repeat(invalid, v, axis=-1)
        return rgb, invalid, sigma
    return query_fn


def test_fine_reuse_coarse_matches_requery():
    """`fine_reuse_coarse` queries only the NEW fine samples and composites
    the unsorted merged set with comparison masks; outputs must equal the
    reference re-query-everything path (nerf.py:230-238) bit-for-bit up to
    float reassociation. depth_std is huge so sample_fine_depth CLIPS many
    samples to near/far — exact ties exercising the stable-order
    tie-break."""
    rng = np.random.default_rng(7)
    rays = np.zeros((1, 64, 8), dtype=np.float32)
    dirs = rng.normal(size=(64, 3))
    rays[0, :, 3:6] = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    rays[0, :, :3] = rng.normal(size=(64, 3)) * 0.1
    rays[0, :, 6] = 3.0
    rays[0, :, 7] = 8.0
    rays = jnp.asarray(rays)

    for hard_cap, white, lindisp in ((False, False, True),
                                     (True, True, False)):
        cfg = rlib.RendererConfig(n_coarse=24, n_fine=16, n_fine_depth=6,
                                  depth_std=5.0, lindisp=lindisp,
                                  hard_alpha_cap=hard_cap, white_bkgd=white)
        key = jax.random.PRNGKey(11)
        ref = rlib.render_rays(_smooth_query(), rays, key, cfg,
                               want_weights=True)
        cfg_c = rlib.RendererConfig(**{**cfg.__dict__,
                                       "fine_reuse_coarse": True})
        got = rlib.render_rays(_smooth_query(), rays, key, cfg_c,
                               want_weights=True)
        for k in ("rgb", "depth"):
            np.testing.assert_allclose(np.asarray(got["fine"][k]),
                                       np.asarray(ref["fine"][k]),
                                       atol=2e-5, err_msg=k)
        # Per-sample outputs are a permutation: reductions must match.
        np.testing.assert_allclose(
            np.asarray(got["fine"]["weights"]).sum(-1),
            np.asarray(ref["fine"]["weights"]).sum(-1), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(got["fine"]["invalid"]).mean(-2),
            np.asarray(ref["fine"]["invalid"]).mean(-2), atol=1e-6)
        # Coarse pass untouched.
        np.testing.assert_allclose(np.asarray(got["coarse"]["depth"]),
                                   np.asarray(ref["coarse"]["depth"]),
                                   atol=1e-6)


def test_fine_reuse_tie_break_has_ties():
    """The depth_std=5 clip in the parity test must actually create
    duplicate z values, otherwise the stable-order tie-break is untested."""
    rays = _axis_rays(b=16, near=3.0, far=8.0)
    z = rlib.sample_fine_depth(jax.random.PRNGKey(2), rays,
                               jnp.full((1, 16), 5.0), 6, 5.0)
    zn = np.asarray(z)
    assert (zn == 3.0).sum() + (zn == 8.0).sum() > 4
