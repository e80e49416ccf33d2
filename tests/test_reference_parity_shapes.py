"""Reference-oracle parity for the NON-flagship benchmark shapes.

tests/test_reference_parity.py proves weight-for-weight equality against
the actual /root/reference torch modules at the flagship KITTI-Raw z-mode
shape. This file extends the same golden-stack methodology to the two
benchmark configurations that differ most from it (VERDICT r4 ask #4):

  (a) the RealEstate10K shape — `code_mode=distance`, inv_z over [1, 100],
      d_out 32, a 1-block ResnetFC, hard_alpha_cap=False
      (reference models_bts.py:157-172 + configs/exp_re10k.yaml);
  (b) the KITTI-360 8-view arrangement — encode the keyframe only,
      kitti360-mono render/loss interleave over stereo+fisheye x 2
      timesteps (reference trainer.py:147-157 + configs/exp_kitti_360.yaml).

Each asserts encode / render / loss bounds matching the flagship stack's
(3e-3 feature grids, 2e-4 weights+rgb, 1e-3 depth, 2e-4 loss).
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from reference_oracle import load_reference
from test_reference_parity import (_make_inputs, _off_boundary_mask,
                                   _ref_renderer, _shared_z, _to_torch_imgs)

from behindthescenes_tpu import renderer as renderer_lib
from behindthescenes_tpu.import_torch import import_bts_checkpoint
from behindthescenes_tpu.losses import ReconstructionLoss
from behindthescenes_tpu.models.bts import BTSNet
from behindthescenes_tpu.ray_sampler import ImageRaySampler

H, W = 64, 96

RE10K_MODEL_CONF = {
    "arch": "BTSNet",
    "use_code": True,
    "prediction_mode": "default",
    "code": {"num_freqs": 6, "freq_factor": 1.5, "include_input": True},
    "encoder": {"type": "monodepth2", "freeze": False, "pretrained": False,
                "resnet_layers": 50, "num_ch_dec": [32, 32, 64, 128, 256],
                "d_out": 32},
    "mlp_coarse": {"type": "resnet", "n_blocks": 1, "d_hidden": 32},
    "mlp_fine": {"type": "empty", "n_blocks": 1, "d_hidden": 128},
    "z_near": 1, "z_far": 100, "inv_z": True,
    "learn_empty": False, "code_mode": "distance",
}

RE10K_RENDERER_CONF = {
    "n_coarse": 48, "n_fine": 0, "n_fine_depth": 0, "depth_std": 1.0,
    "sched": [], "white_bkgd": False, "lindisp": True,
    "hard_alpha_cap": False,
}

K360_MODEL_CONF = {
    "arch": "BTSNet",
    "use_code": True,
    "prediction_mode": "default",
    "code": {"num_freqs": 6, "freq_factor": 1.5, "include_input": True},
    "encoder": {"type": "monodepth2", "freeze": False, "pretrained": False,
                "resnet_layers": 50, "num_ch_dec": [32, 32, 64, 128, 256],
                "d_out": 64},
    "mlp_coarse": {"type": "resnet", "n_blocks": 0, "d_hidden": 64},
    "mlp_fine": {"type": "empty", "n_blocks": 1, "d_hidden": 128},
    "z_near": 3, "z_far": 80, "inv_z": True,
    "learn_empty": False, "code_mode": "z",
}

LOSS_CONF = {"criterion": "l1+ssim", "invalid_policy": "weight_guided",
             "lambda_edge_aware_smoothness": 0.001}

# reference trainer.py:147-157, v=8 (stereo + 2 fisheye, 2 timesteps),
# start_from=0 branch: per-camera alternate-timestep loss/render split.
K360_IDS_LOSS = [0, 3, 4, 7]
K360_IDS_RENDER = [1, 2, 5, 6]


def _build_stack(tmp_path_factory, model_conf, tag):
    ref = load_reference()
    torch.manual_seed(0)
    tnet = ref.bts.BTSNet(model_conf)
    tnet.train()
    with torch.no_grad():
        tnet.encoder(torch.randn(2, 3, H, W) * 0.5)
    tnet.eval()
    path = tmp_path_factory.mktemp("golden") / f"bts_{tag}.pt"
    torch.save(tnet.state_dict(), str(path))
    params, batch_stats = import_bts_checkpoint(str(path), resnet_layers=50)
    jnet = BTSNet.from_conf(model_conf)
    return ref, tnet, jnet, {"params": params, "batch_stats": batch_stats}


@pytest.fixture(scope="module")
def re10k_stacks(tmp_path_factory):
    return _build_stack(tmp_path_factory, RE10K_MODEL_CONF, "re10k")


@pytest.fixture(scope="module")
def k360_stacks(tmp_path_factory):
    return _build_stack(tmp_path_factory, K360_MODEL_CONF, "k360")


def _encode_both(tnet, jnet, variables, images, poses, ks, ids_encoder,
                 ids_render):
    with torch.no_grad():
        tnet.encode(_to_torch_imgs(images), torch.from_numpy(ks),
                    torch.from_numpy(poses), ids_encoder=list(ids_encoder),
                    ids_render=list(ids_render))
    return jnet.apply(variables, jnp.asarray(images), jnp.asarray(ks),
                      jnp.asarray(poses), ids_encoder=list(ids_encoder),
                      ids_render=list(ids_render), method=BTSNet.encode)


def _assert_render_and_loss(ref, tnet, jnet, variables, grid, images, poses,
                            ks, loss_views, rcfg_dict, z_near, z_far, k):
    cfg = renderer_lib.RendererConfig.from_conf(dict(rcfg_dict, n_coarse=k))
    imgs01 = images * 0.5 + 0.5
    tsampler = ref.ray_sampler.ImageRaySampler(z_near, z_far)
    trays, trgb_gt = tsampler.sample(
        _to_torch_imgs(imgs01[:, loss_views]),
        torch.from_numpy(poses[:, loss_views]),
        torch.from_numpy(ks[:, loss_views]))
    jsampler = ImageRaySampler(z_near, z_far, height=H, width=W)
    jrays, jrgb_gt = jsampler.sample(
        None, jnp.asarray(imgs01[:, loss_views]),
        jnp.asarray(poses[:, loss_views]), jnp.asarray(ks[:, loss_views]))
    np.testing.assert_allclose(np.asarray(jrays), trays.numpy(), atol=2e-5)

    z_np = _shared_z(trays.numpy().reshape(1, -1, 8)[0], k, cfg.lindisp)

    trend = _ref_renderer(ref, cfg)
    with torch.no_grad():
        t_comp = trend.composite(tnet, trays.reshape(-1, 8),
                                 torch.from_numpy(z_np), coarse=True, sb=1)
    (t_weights, t_rgb, t_depth, _, t_invalid, _, _) = t_comp

    def query_fn(xyz, coarse):
        return jnet.apply(variables, grid, xyz, coarse=coarse,
                          method=BTSNet.query)

    jrays_flat = jrays.reshape(1, -1, 8)
    j_out = renderer_lib.composite(query_fn, jrays_flat,
                                   jnp.asarray(z_np)[None], cfg)

    nv = t_invalid.shape[-1]
    rays_np = trays.numpy().reshape(-1, 8)
    pts = (rays_np[:, None, :3] + z_np[..., None] * rays_np[:, None, 3:6])
    # invalid ORs encoder view 0 and each render view; require fp margin in
    # all views (conservative; same methodology as the flagship test).
    off = _off_boundary_mask(pts, poses, ks)
    j_inv = np.asarray(j_out["invalid"][0])
    t_inv = t_invalid.numpy().reshape(-1, k, nv)
    np.testing.assert_array_equal(j_inv[off], t_inv[off])
    assert np.mean(j_inv != t_inv) < 5e-3

    np.testing.assert_allclose(np.asarray(j_out["weights"][0]),
                               t_weights.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_out["rgb"][0]), t_rgb.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_out["depth"][0]),
                               t_depth.numpy(), atol=1e-3, rtol=1e-4)

    # Loss through reconstruct (reference loss.py + trainer.py:220-259).
    t_coarse = trend._format_outputs(t_comp, 1, want_weights=True,
                                     want_alphas=True, want_rgb_samps=True)
    t_render = {"coarse": t_coarse, "fine": dict(t_coarse),
                "rgb_gt": trgb_gt}
    t_render = tsampler.reconstruct(t_render)
    t_loss, _ = ref.loss.ReconstructionLoss(LOSS_CONF)(
        {"coarse": [t_render["coarse"]], "fine": [t_render["fine"]],
         "rgb_gt": t_render["rgb_gt"]})

    j_coarse = {kk: j_out[kk] for kk in
                ("rgb", "depth", "invalid", "weights", "alphas",
                 "rgb_samps")}
    j_render = {"coarse": j_coarse, "fine": dict(j_coarse),
                "rgb_gt": jrgb_gt}
    j_render = jsampler.reconstruct(j_render)
    j_loss, _ = ReconstructionLoss.from_conf(LOSS_CONF)(
        {"coarse": [j_render["coarse"]], "fine": [j_render["fine"]],
         "rgb_gt": j_render["rgb_gt"]})
    assert abs(float(j_loss) - float(t_loss)) < 2e-4, \
        (float(j_loss), float(t_loss))


def test_re10k_encode_parity(re10k_stacks):
    ref, tnet, jnet, variables = re10k_stacks
    images, poses, ks = _make_inputs(v=3)
    grid = _encode_both(tnet, jnet, variables, images, poses, ks,
                        ids_encoder=[0], ids_render=[0, 1])
    for s in range(len(grid.features)):
        theirs = np.transpose(tnet.grid_f_features[s].numpy(),
                              (0, 1, 3, 4, 2))
        np.testing.assert_allclose(np.asarray(grid.features[s]), theirs,
                                   atol=3e-3, err_msg=f"scale {s}")


def test_re10k_render_and_loss_parity(re10k_stacks):
    """Distance positional code + inv_z over [1, 100] + 1-block ResnetFC +
    hard_alpha_cap=False — weight-for-weight vs the reference."""
    ref, tnet, jnet, variables = re10k_stacks
    images, poses, ks = _make_inputs(v=3)
    grid = _encode_both(tnet, jnet, variables, images, poses, ks,
                        ids_encoder=[0], ids_render=[0, 1])
    _assert_render_and_loss(ref, tnet, jnet, variables, grid, images, poses,
                            ks, loss_views=[2], rcfg_dict=RE10K_RENDERER_CONF,
                            z_near=1.0, z_far=100.0, k=12)


def test_k360_mono_8view_parity(k360_stacks):
    """The 8-view kitti360-mono arrangement: encode the keyframe, render
    from the alternate-timestep interleave, loss on the other four views —
    weight-for-weight vs the reference at the same id sets."""
    ref, tnet, jnet, variables = k360_stacks
    images, poses, ks = _make_inputs(seed=3, v=8)
    grid = _encode_both(tnet, jnet, variables, images, poses, ks,
                        ids_encoder=[0], ids_render=K360_IDS_RENDER)
    assert grid.color_imgs.shape[1] == 4
    # Loss rays from two of the four loss views (CPU budget); the id
    # structure (4 render views from both timesteps) is fully exercised.
    _assert_render_and_loss(ref, tnet, jnet, variables, grid, images, poses,
                            ks, loss_views=K360_IDS_LOSS[:2],
                            rcfg_dict={"n_coarse": 8, "lindisp": True,
                                       "hard_alpha_cap": True},
                            z_near=3.0, z_far=80.0, k=8)
