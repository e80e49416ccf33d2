"""Product evaluators on a multi-device mesh == single-device.

Round-3 verdict: the ray-sharded render was proven correct in
tests/test_multidevice_equiv.py but the PRODUCT evaluators never built a
mesh — multi-chip eval was test-only. Now DepthEvaluator/NVSEvaluator
shard each frame's ray dimension and the occupancy evaluators shard their
dense density-grid query over parallel.mesh.eval_mesh() (all local
devices). These tests pin that the sharded paths (a) actually engage on
the 8-device virtual mesh and (b) produce the same metrics as
BTS_EVAL_SHARD=0 single-device eval — the reference's DDP-eval guarantee
(utils/base_evaluator.py:15) in GSPMD form.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from behindthescenes_tpu import renderer as renderer_lib
from behindthescenes_tpu.models.bts import BTSNet

H, W = 32, 48

needs_mesh = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs the 8-device virtual mesh")


def _model_conf():
    return {
        "arch": "BTSNet",
        "z_near": 3.0, "z_far": 80.0, "inv_z": True, "code_mode": "z",
        "learn_empty": False,
        "code": {"num_freqs": 4, "freq_factor": 1.5, "include_input": True},
        "encoder": {"type": "monodepth2", "resnet_layers": 18,
                    "num_ch_dec": [16, 16, 32, 32, 64], "d_out": 16},
        "mlp_coarse": {"type": "resnet", "n_blocks": 0, "d_hidden": 32},
        "mlp_fine": {"type": "empty"},
    }


@pytest.fixture(scope="module")
def setup():
    mc = _model_conf()
    net = BTSNet.from_conf(mc)
    rng = np.random.default_rng(4)
    v = 2
    images = jnp.asarray(rng.uniform(-1, 1, (1, v, H, W, 3)), jnp.float32)
    poses = jnp.broadcast_to(jnp.eye(4), (1, v, 4, 4)).at[:, 1, 0, 3].set(0.5)
    projs = jnp.broadcast_to(jnp.asarray(
        [[0.6, 0, 0], [0, 1.8, 0], [0, 0, 1]], jnp.float32), (1, v, 3, 3))
    variables = net.init(jax.random.PRNGKey(0), images, projs, poses,
                         jnp.zeros((1, 8, 3)))
    depth_gt = np.asarray(
        rng.uniform(3.0, 30.0, (1, 1, H, W)), dtype=np.float32)
    batch = {"imgs": np.asarray(images), "poses": np.asarray(poses),
             "projs": np.asarray(projs), "depths": depth_gt}
    return net, _model_conf(), variables, batch


def _depth_evaluator(net, mc, sharded, monkeypatch):
    from behindthescenes_tpu.evaluation.depth import DepthEvaluator
    monkeypatch.setenv("BTS_EVAL_SHARD", "1" if sharded else "0")
    rcfg = renderer_lib.RendererConfig(n_coarse=8, lindisp=True,
                                       hard_alpha_cap=True)
    # eval_selfview=False: the general chunked path is the one the mesh
    # shards (the selfview fast path is per-pixel dense and single-chip).
    ev = DepthEvaluator(net, rcfg, dict(mc, eval_selfview=False))
    assert (ev.mesh is not None) == sharded
    return ev


@needs_mesh
def test_depth_eval_sharded_matches_single_device(setup, monkeypatch):
    net, mc, variables, batch = setup
    m_shard = _depth_evaluator(net, mc, True, monkeypatch) \
        .evaluate(variables, batch)
    m_single = _depth_evaluator(net, mc, False, monkeypatch) \
        .evaluate(variables, batch)
    for k, vs in m_shard.items():
        assert abs(vs - m_single[k]) <= 1e-5 * max(1.0, abs(m_single[k])), \
            (k, vs, m_single[k])


@needs_mesh
def test_nvs_eval_sharded_matches_single_device(setup, monkeypatch):
    from behindthescenes_tpu.evaluation.nvs import NVSEvaluator
    net, mc, variables, batch = setup
    rcfg = renderer_lib.RendererConfig(n_coarse=8, lindisp=True,
                                       hard_alpha_cap=True)
    outs = []
    for sharded in (True, False):
        monkeypatch.setenv("BTS_EVAL_SHARD", "1" if sharded else "0")
        ev = NVSEvaluator(net, rcfg, mc)
        assert (ev.mesh is not None) == sharded
        outs.append(ev.evaluate(variables, batch))
    for k in outs[0]:
        assert abs(outs[0][k] - outs[1][k]) \
            <= 1e-4 * max(1.0, abs(outs[1][k])), (k, outs)


@needs_mesh
def test_sharded_render_nondivisible_rays(setup):
    """A frame whose ray count does not divide the mesh width must still
    shard (the single-chunk branch pads to a multiple of the rays axis)
    and must equal the unsharded render after stripping the padding."""
    from behindthescenes_tpu import renderer as renderer_lib
    from behindthescenes_tpu.parallel.mesh import eval_mesh
    from behindthescenes_tpu.ray_sampler import ImageRaySampler

    net, mc, variables, batch = setup
    mesh = eval_mesh()
    assert mesh is not None and mesh.shape["rays"] == 8
    h, w = 15, 21                                 # 315 rays, 315 % 8 = 3
    sampler = ImageRaySampler(3.0, 80.0, height=h, width=w)
    rcfg = renderer_lib.RendererConfig(n_coarse=8, lindisp=True,
                                       hard_alpha_cap=True)
    poses = jnp.asarray(batch["poses"])[:, :1]
    projs = jnp.asarray(batch["projs"])[:, :1]
    grid = net.apply(variables, jnp.asarray(batch["imgs"]),
                     jnp.asarray(batch["projs"]),
                     jnp.asarray(batch["poses"]), ids_encoder=[0],
                     ids_render=[0], method=BTSNet.encode)
    rays, _ = sampler.sample(None, None, poses, projs)
    assert rays.shape[1] % 8 != 0

    def query_fn(xyz, coarse):
        return net.apply(variables, grid, xyz, coarse=coarse,
                         method=BTSNet.query)

    key = jax.random.PRNGKey(3)
    out_m = jax.jit(lambda r: renderer_lib.render_rays_chunked(
        query_fn, r, key, rcfg, ray_chunk=16384, mesh=mesh))(rays)
    out_1 = jax.jit(lambda r: renderer_lib.render_rays_chunked(
        query_fn, r, key, rcfg, ray_chunk=16384))(rays)
    for branch in out_m:
        for k in out_m[branch]:
            a, b = np.asarray(out_m[branch][k]), np.asarray(out_1[branch][k])
            assert a.shape == b.shape, (branch, k, a.shape, b.shape)
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5,
                                       err_msg=f"{branch}/{k}")


@needs_mesh
def test_occupancy_query_sharded_matches_single_device(setup, monkeypatch):
    """The dense density-grid query (LiDAR/3dbb occupancy evals) sharded
    over the mesh == unsharded, including the padded tail chunk."""
    from behindthescenes_tpu.evaluation.bbox_occ import BBoxOccEvaluator
    net, mc, variables, batch = setup
    rcfg = renderer_lib.RendererConfig(n_coarse=8, lindisp=True,
                                       hard_alpha_cap=True)
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.uniform(-1, 1, (3777, 3)) * np.array([4, 1, 8])
                      + np.array([0, 0, 10.0]), jnp.float32)
    grid = net.apply(variables, jnp.asarray(batch["imgs"]),
                     jnp.asarray(batch["projs"]),
                     jnp.asarray(batch["poses"]), ids_encoder=[0],
                     ids_render=[0], method=BTSNet.encode)
    sigmas = []
    for sharded in (True, False):
        monkeypatch.setenv("BTS_EVAL_SHARD", "1" if sharded else "0")
        ev = BBoxOccEvaluator(net, rcfg,
                              dict(mc, query_batch_size=256), dataset=None)
        assert (ev.mesh is not None) == sharded
        _, query = ev._build_fns(H, W, H, W)
        sigmas.append(np.asarray(query(variables, grid, pts)))
    np.testing.assert_allclose(sigmas[0], sigmas[1], rtol=1e-5, atol=1e-6)
