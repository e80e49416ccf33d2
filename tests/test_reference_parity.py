"""GOLDEN end-to-end parity against the ACTUAL reference implementation.

Loads /root/reference's torch modules (models_bts.py, nerf.py, loss.py,
ray_sampler.py) through tests/reference_oracle.py, builds the flagship
BTSNet (exp_kitti_raw model conf) in BOTH stacks with identical weights
(transferred via import_torch), and asserts:

  (a) encode: multiscale feature grids match,
  (b) render: full-frame composite depth/rgb/invalid/weights match,
  (c) loss: one training loss value (l1+ssim + weight_guided + edge-aware
      smoothness) matches through reconstruct,
  (d) the TPU-first self-view fast paths match the reference general path,
  (e) waymo-style combine-group resolution is value-equivalent.

Any semantic drift (grid_sample corners, combine, invalid policies, loss
reductions) fails here. Tolerances are float32 accumulation-order noise
only (conv stacks reduce in different orders under XLA vs torch).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_oracle import (FLAGSHIP_LOSS_CONF, FLAGSHIP_MODEL_CONF,
                              FLAGSHIP_RENDERER_CONF, load_reference)

from behindthescenes_tpu import geometry
from behindthescenes_tpu import renderer as renderer_lib
from behindthescenes_tpu.import_torch import import_bts_checkpoint
from behindthescenes_tpu.inference import render_depth_selfview
from behindthescenes_tpu.losses import ReconstructionLoss
from behindthescenes_tpu.models.bts import BTSNet
from behindthescenes_tpu.ray_sampler import ImageRaySampler

H, W = 64, 96


def _make_inputs(seed=0, n=1, v=2, h=H, w=W):
    """Smooth deterministic multi-view inputs (smoothness keeps bilinear-
    sample fp noise from amplifying through image gradients)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    images = np.stack([
        np.stack([np.sin(4 * np.pi * (xx + 0.13 * i + 0.2 * c * yy))
                  for c in range(3)], -1)
        for i in range(v)], 0)[None] * 0.7
    images += rng.uniform(-0.05, 0.05, images.shape)
    images = np.clip(images, -1, 1).astype(np.float32)

    poses = np.tile(np.eye(4, dtype=np.float32), (n, v, 1, 1))
    for i in range(1, v):
        th = 0.04 * i
        rot = np.array([[np.cos(th), 0, np.sin(th)],
                        [0, 1, 0],
                        [-np.sin(th), 0, np.cos(th)]], dtype=np.float32)
        poses[:, i, :3, :3] = rot
        poses[:, i, 0, 3] = 0.54 * i       # stereo-like x offset
        poses[:, i, 2, 3] = -0.1 * i

    ks = np.tile(np.array([[1.7, 0.0, 0.0],
                           [0.0, 0.58, 0.0],
                           [0.0, 0.0, 1.0]], dtype=np.float32), (n, v, 1, 1))
    return images, poses, ks


def _to_torch_imgs(images):
    return torch.from_numpy(np.transpose(images, (0, 1, 4, 2, 3)))


@pytest.fixture(scope="module")
def stacks(tmp_path_factory):
    ref = load_reference()
    torch.manual_seed(0)
    tnet = ref.bts.BTSNet(FLAGSHIP_MODEL_CONF)
    # Move BN running stats off their init defaults so stats transfer is
    # actually exercised.
    tnet.train()
    with torch.no_grad():
        tnet.encoder(torch.randn(2, 3, H, W) * 0.5)
    tnet.eval()

    path = tmp_path_factory.mktemp("golden") / "bts_flagship.pt"
    torch.save(tnet.state_dict(), str(path))
    params, batch_stats = import_bts_checkpoint(str(path), resnet_layers=50)

    jnet = BTSNet.from_conf(FLAGSHIP_MODEL_CONF)
    variables = {"params": params, "batch_stats": batch_stats}
    return ref, tnet, jnet, variables


def _encode_both(ref, tnet, jnet, variables, images, poses, ks,
                 ids_encoder=(0,), ids_render=(0, 1), combine_ids=None):
    timgs = _to_torch_imgs(images)
    tposes = torch.from_numpy(poses)
    tks = torch.from_numpy(ks)
    with torch.no_grad():
        tnet.encode(timgs, tks, tposes, ids_encoder=list(ids_encoder),
                    ids_render=list(ids_render), combine_ids=combine_ids)
    grid = jnet.apply(variables, jnp.asarray(images), jnp.asarray(ks),
                      jnp.asarray(poses), ids_encoder=list(ids_encoder),
                      ids_render=list(ids_render), combine_ids=combine_ids,
                      method=BTSNet.encode)
    return grid


def test_encode_feature_grid_parity(stacks):
    """(a) The multiscale feature grids match (reference models_bts.py:65-136
    vs behindthescenes_tpu/models/bts.py encode)."""
    ref, tnet, jnet, variables = stacks
    images, poses, ks = _make_inputs()
    grid = _encode_both(ref, tnet, jnet, variables, images, poses, ks)

    assert len(grid.features) == len(tnet.grid_f_features)
    for s in range(len(grid.features)):
        theirs = tnet.grid_f_features[s].numpy()        # (n, nv, c, h, w)
        theirs = np.transpose(theirs, (0, 1, 3, 4, 2))
        ours = np.asarray(grid.features[s])
        np.testing.assert_allclose(ours, theirs, atol=3e-3,
                                   err_msg=f"feature grid scale {s}")
    # Stashed camera data
    np.testing.assert_allclose(np.asarray(grid.f_poses_w2c),
                               tnet.grid_f_poses_w2c.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(grid.color_imgs),
                               np.transpose(tnet.grid_c_imgs.numpy(),
                                            (0, 1, 3, 4, 2)), atol=1e-6)


def _shared_z(rays_np, k, lindisp, seed=3):
    """Stratified z samples computed once in numpy and fed to BOTH stacks
    (the reference formula, nerf.py:103-123)."""
    rng = np.random.default_rng(seed)
    near, far = rays_np[..., 6:7], rays_np[..., 7:8]
    step = 1.0 / k
    z_steps = np.linspace(0, 1 - step, k, dtype=np.float32)
    z_steps = z_steps + rng.uniform(0, step, rays_np.shape[:-1] + (k,)) \
        .astype(np.float32)
    if lindisp:
        return (1.0 / (1.0 / near * (1 - z_steps) + 1.0 / far * z_steps)) \
            .astype(np.float32)
    return (near * (1 - z_steps) + far * z_steps).astype(np.float32)


def test_full_render_parity(stacks):
    """(b) rays + full-frame composite match: depth/rgb/invalid/weights
    (reference nerf.py:210-313 + ray_sampler.py:224-260 vs ours)."""
    ref, tnet, jnet, variables = stacks
    images, poses, ks = _make_inputs()
    grid = _encode_both(ref, tnet, jnet, variables, images, poses, ks)

    z_near, z_far = 3.0, 80.0
    k = 16
    cfg = renderer_lib.RendererConfig.from_conf(
        dict(FLAGSHIP_RENDERER_CONF, n_coarse=k))

    # Rays from both stacks must agree (gen_rays parity).
    tsampler = ref.ray_sampler.ImageRaySampler(z_near, z_far)
    timgs = _to_torch_imgs(images * 0.5 + 0.5)
    trays, trgb_gt = tsampler.sample(timgs, torch.from_numpy(poses),
                                     torch.from_numpy(ks))
    jsampler = ImageRaySampler(z_near, z_far, height=H, width=W)
    jrays, jrgb_gt = jsampler.sample(None, jnp.asarray(images * 0.5 + 0.5),
                                     jnp.asarray(poses), jnp.asarray(ks))
    np.testing.assert_allclose(np.asarray(jrays), trays.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(jrgb_gt), trgb_gt.numpy(),
                               atol=1e-6)

    rays_np = trays.numpy()
    z_np = _shared_z(rays_np[0], k, cfg.lindisp)

    with torch.no_grad():
        t_out = ref.nerf.NeRFRenderer.composite(
            _ref_renderer(ref, cfg), tnet, trays.reshape(-1, 8),
            torch.from_numpy(z_np), coarse=True, sb=1)
    (t_weights, t_rgb, t_depth, t_alphas, t_invalid, _, t_rgb_samps) = t_out

    def query_fn(xyz, coarse):
        return jnet.apply(variables, grid, xyz, coarse=coarse,
                          method=BTSNet.query)

    j_out = renderer_lib.composite(query_fn, jrays, jnp.asarray(z_np)[None],
                                   cfg)

    # Invalid bits: self-view rays project back onto EXACT NDC boundary
    # pixels (xy == ±1.0), where 1-ulp fp differences legitimately flip the
    # strict `xy < -1` test (models_bts.py:155). Compare away from the
    # boundary; bound the boundary flip rate.
    j_inv = np.asarray(j_out["invalid"][0])
    t_inv = t_invalid.numpy().reshape(-1, k, 2)
    pts = (rays_np[0][:, None, :3]
           + z_np[..., None] * rays_np[0][:, None, 3:6])       # (B, K, 3)
    off_boundary = _off_boundary_mask(pts, poses, ks, tol=1e-4)
    np.testing.assert_array_equal(j_inv[off_boundary], t_inv[off_boundary])
    flip_rate = np.mean(j_inv != t_inv)
    assert flip_rate < 5e-3, f"invalid flip rate {flip_rate}"
    np.testing.assert_allclose(np.asarray(j_out["weights"][0]),
                               t_weights.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_out["rgb"][0]), t_rgb.numpy(),
                               atol=2e-4)
    d_ours = np.asarray(j_out["depth"][0])
    d_theirs = t_depth.numpy()
    np.testing.assert_allclose(d_ours, d_theirs, atol=1e-3, rtol=1e-4)


def _off_boundary_mask(pts, poses, ks, tol=1e-4):
    """(B, K) bool: True where the point projects strictly inside the NDC
    frustum boundary (plus z > EPS margin) in EVERY view — the region where
    the invalid bit is fp-robust. Column v of `invalid` ORs the encoder
    view 0 and render view v, so require margin in all views."""
    b, k, _ = pts.shape
    w2c = np.linalg.inv(poses[0])                              # (v, 4, 4)
    ok = np.ones((b, k), dtype=bool)
    for v in range(poses.shape[1]):
        cam = pts @ w2c[v, :3, :3].T + w2c[v, :3, 3]
        xy = cam[..., :2] * ks[0, v, [0, 1], [0, 1]] \
            + ks[0, v, [0, 1], [2, 2]] * cam[..., 2:3]
        xy = xy / np.maximum(cam[..., 2:3], 1e-3)
        margin = np.minimum(1.0 - np.abs(xy[..., 0]),
                            1.0 - np.abs(xy[..., 1]))
        ok &= (np.abs(margin) > tol) & (np.abs(cam[..., 2] - 1e-3) > tol)
    return ok


def _ref_renderer(ref, cfg):
    return ref.nerf.NeRFRenderer(
        n_coarse=cfg.n_coarse, n_fine=cfg.n_fine,
        n_fine_depth=cfg.n_fine_depth, depth_std=cfg.depth_std,
        white_bkgd=cfg.white_bkgd, lindisp=cfg.lindisp,
        hard_alpha_cap=cfg.hard_alpha_cap)


def test_training_loss_parity(stacks):
    """(c) One training loss value matches end to end: render -> reconstruct
    -> ReconstructionLoss (reference loss.py:43-293 + trainer.py:220-259)."""
    ref, tnet, jnet, variables = stacks
    h, w = H, W   # 5-level resnet50 needs ≥2 px in the deepest map
    images, poses, ks = _make_inputs(seed=7, h=h, w=w)
    grid = _encode_both(ref, tnet, jnet, variables, images, poses, ks)

    z_near, z_far = 3.0, 80.0
    k = 8
    cfg = renderer_lib.RendererConfig.from_conf(
        dict(FLAGSHIP_RENDERER_CONF, n_coarse=k))

    imgs01 = images * 0.5 + 0.5
    tsampler = ref.ray_sampler.ImageRaySampler(z_near, z_far)
    trays, trgb_gt = tsampler.sample(_to_torch_imgs(imgs01),
                                     torch.from_numpy(poses),
                                     torch.from_numpy(ks))
    jsampler = ImageRaySampler(z_near, z_far, height=h, width=w)
    jrays, jrgb_gt = jsampler.sample(None, jnp.asarray(imgs01),
                                     jnp.asarray(poses), jnp.asarray(ks))

    z_np = _shared_z(trays.numpy()[0], k, cfg.lindisp, seed=11)

    # Reference render dict (composite + _format_outputs, sb=1).
    trend = _ref_renderer(ref, cfg)
    with torch.no_grad():
        t_comp = trend.composite(tnet, trays.reshape(-1, 8),
                                 torch.from_numpy(z_np), coarse=True, sb=1)
    t_coarse = trend._format_outputs(t_comp, 1, want_weights=True,
                                     want_alphas=True, want_rgb_samps=True)
    t_render = {"coarse": t_coarse, "fine": dict(t_coarse),
                "rgb_gt": trgb_gt}
    t_render = tsampler.reconstruct(t_render)
    t_data = {"coarse": [t_render["coarse"]], "fine": [t_render["fine"]],
              "rgb_gt": t_render["rgb_gt"]}
    t_crit = ref.loss.ReconstructionLoss(FLAGSHIP_LOSS_CONF)
    t_loss, t_loss_dict = t_crit(t_data)

    # Our render dict through the same plumbing.
    def query_fn(xyz, coarse):
        return jnet.apply(variables, grid, xyz, coarse=coarse,
                          method=BTSNet.query)

    j_out = renderer_lib.composite(query_fn, jrays, jnp.asarray(z_np)[None],
                                   cfg)
    j_coarse = {kk: j_out[kk] for kk in
                ("rgb", "depth", "invalid", "weights", "alphas", "rgb_samps")}
    j_render = {"coarse": j_coarse, "fine": dict(j_coarse),
                "rgb_gt": jrgb_gt}
    j_render = jsampler.reconstruct(j_render)
    j_data = {"coarse": [j_render["coarse"]], "fine": [j_render["fine"]],
              "rgb_gt": j_render["rgb_gt"]}
    j_crit = ReconstructionLoss.from_conf(FLAGSHIP_LOSS_CONF)
    j_loss, j_loss_dict = j_crit(j_data)

    assert abs(float(j_loss) - float(t_loss)) < 2e-4, \
        f"total loss {float(j_loss)} vs reference {float(t_loss)}"
    for name in ("loss_rgb_coarse", "loss_eas", "loss_invalid_ratio"):
        if name in t_loss_dict:
            assert abs(float(j_loss_dict[name])
                       - float(t_loss_dict[name])) < 2e-4, name


def test_selfview_fastpath_matches_reference(stacks):
    """(d) The TPU-first self-view density fast paths produce the same
    keyframe depth as the reference general path (same z samples)."""
    ref, tnet, jnet, variables = stacks
    images, poses, ks = _make_inputs(seed=5)
    grid = _encode_both(ref, tnet, jnet, variables, images, poses, ks)

    z_near, z_far = 3.0, 80.0
    k = 16
    cfg = renderer_lib.RendererConfig.from_conf(
        dict(FLAGSHIP_RENDERER_CONF, n_coarse=k))

    # --- stochastic fast path: take its z_samp, replay through reference
    depth_j, _, z_samp = render_depth_selfview(
        jnet, variables, grid, jax.random.PRNGKey(0), H, W, cfg,
        z_near, z_far, as_z_depth=True)

    tsampler = ref.ray_sampler.ImageRaySampler(z_near, z_far, height=H,
                                               width=W)
    trays, _ = tsampler.sample(None, torch.from_numpy(poses[:, :1]),
                               torch.from_numpy(ks[:, :1]))
    trend = _ref_renderer(ref, cfg)
    with torch.no_grad():
        t_comp = trend.composite(tnet, trays.reshape(-1, 8),
                                 torch.from_numpy(np.asarray(z_samp)),
                                 coarse=True, sb=1)
    t_depth_dist = t_comp[2].reshape(1, 1, H, W)
    t_depth_z = ref.proj.distance_to_z(t_depth_dist,
                                       torch.from_numpy(ks[:, :1]))
    np.testing.assert_allclose(np.asarray(depth_j[0]),
                               t_depth_z.numpy()[0, 0], atol=5e-3, rtol=1e-3)

    # --- deterministic shared-z fast path vs reference on the same ladder
    depth_d, _, z_dist = render_depth_selfview(
        jnet, variables, grid, jax.random.PRNGKey(0), H, W, cfg,
        z_near, z_far, as_z_depth=True, deterministic=True)
    with torch.no_grad():
        t_comp = trend.composite(tnet, trays.reshape(-1, 8),
                                 torch.from_numpy(np.asarray(z_dist)),
                                 coarse=True, sb=1)
    t_depth_z = ref.proj.distance_to_z(t_comp[2].reshape(1, 1, H, W),
                                       torch.from_numpy(ks[:, :1]))
    np.testing.assert_allclose(np.asarray(depth_d[0]),
                               t_depth_z.numpy()[0, 0], atol=5e-3, rtol=1e-3)


def test_combine_groups_value_equivalence(stacks):
    """(e) waymo-style combine groups: the reference resolves groups from id
    VALUES (models_bts.py:93-107); our positional pre-resolution must give
    identical query outputs for a concrete permutation."""
    ref, tnet, jnet, variables = stacks
    v, steps = 6, 2   # waymo-3: views [c0_t0, c0_t1, c1_t0, c1_t1, c2_t0, ...]
    images, poses, ks = _make_inputs(seed=9, v=v)
    ids_encoder = [0, steps, steps * 2]
    ids_render = list(range(v))
    combine_ids = [(i, steps + i, steps * 2 + i) for i in range(steps)]

    grid = _encode_both(ref, tnet, jnet, variables, images, poses, ks,
                        ids_encoder=ids_encoder, ids_render=ids_render,
                        combine_ids=combine_ids)
    assert grid.f_combine is not None

    rng = np.random.default_rng(2)
    xyz = rng.uniform(-1, 1, (1, 64, 3)).astype(np.float32)
    xyz[..., 2] = xyz[..., 2] * 4 + 10.0

    with torch.no_grad():
        t_rgb, t_invalid, t_sigma = tnet(torch.from_numpy(xyz))
    j_rgb, j_invalid, j_sigma = jnet.apply(variables, grid,
                                           jnp.asarray(xyz),
                                           method=BTSNet.query)
    np.testing.assert_allclose(np.asarray(j_sigma), t_sigma.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_rgb), t_rgb.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_invalid),
                               t_invalid.numpy().astype(np.float32),
                               atol=1e-6)
