"""Single-device vs multi-device numerical equivalence.

The reference inherits a guarantee from DDP (reference
models/bts/trainer.py:418, ignite idist.auto_model): training math is
independent of the device count — an N-GPU step on a global batch equals
the 1-GPU step on the same batch. Our equivalent guarantee comes from
GSPMD: the jitted step with a sharded batch must compute exactly the same
function as the unsharded step. These tests pin that — a wrong psum/mean,
a sharding spec that silently slices instead of shards, or per-device RNG
divergence all break them.

Runs on the virtual 8-device CPU mesh (tests/conftest.py), f32 end to end
so the comparison isn't clouded by bf16 accumulation noise. Tolerances:
cross-device reductions may legally reassociate sums, so we assert
allclose at reduction-noise scale, not bit equality.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from behindthescenes_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                               make_mesh_2d, ray_sharding,
                                               replicated_sharding,
                                               shard_batch)
from behindthescenes_tpu.training.trainer import BTSTrainer

H, W = 32, 48


def _tiny_config():
    return {
        "seed": 0,
        "learning_rate": 1e-4,
        "batch_size": 8,
        "bf16": False,                       # f32: isolate sharding math
        "model_conf": {
            "arch": "BTSNet",
            "z_near": 3.0, "z_far": 80.0, "inv_z": True, "code_mode": "z",
            "learn_empty": False,
            "code": {"num_freqs": 4, "freq_factor": 1.5,
                     "include_input": True},
            "encoder": {"type": "monodepth2", "resnet_layers": 18,
                        "num_ch_dec": [16, 16, 32, 32, 64], "d_out": 16},
            "mlp_coarse": {"type": "resnet", "n_blocks": 0, "d_hidden": 32},
            "mlp_fine": {"type": "empty"},
            "n_frames_render": 2, "frame_sample_mode": "default",
            "sample_mode": "patch", "patch_size": 4, "ray_batch_size": 64,
            "flip_augmentation": False,
        },
        "loss": {"criterion": "l1+ssim", "invalid_policy": "weight_guided",
                 "lambda_edge_aware_smoothness": 0.001},
        "renderer": {"n_coarse": 8, "n_fine": 0, "lindisp": True,
                     "hard_alpha_cap": True},
        "scheduler": {"type": "fix"},
    }


def _batch(n, v=3):
    rng = np.random.default_rng(3)
    images = rng.uniform(-1, 1, (n, v, H, W, 3)).astype(np.float32)
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (n, v, 4, 4)).copy()
    poses[:, 1:, 0, 3] = 0.5
    projs = np.broadcast_to(
        np.array([[0.6, 0, 0], [0, 1.8, 0], [0, 0, 1]], dtype=np.float32),
        (n, v, 3, 3)).copy()
    return {"imgs": jnp.asarray(images), "poses": jnp.asarray(poses),
            "projs": jnp.asarray(projs)}


def _allclose_tree(a, b, rtol, atol_of_max, what, atol_floor=1e-9):
    """Per-leaf scale-aware comparison: the absolute floor is a fraction of
    the leaf's own magnitude. Per-device conv tiling legally reorders f32
    accumulation, so tiny-magnitude elements inside an O(1e-4) leaf carry
    O(1e-7) absolute noise — while a real sharding bug (missing psum,
    sliced batch) shifts the whole leaf by O(1) relative."""
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for (path, la), lb in zip(flat_a, flat_b):
        la, lb = np.asarray(la), np.asarray(lb)
        atol = max(atol_floor, atol_of_max * float(np.abs(la).max()
                                                   if la.size else 0.0))
        np.testing.assert_allclose(
            la, lb, rtol=rtol, atol=atol,
            err_msg=f"{what}: leaf {jax.tree_util.keystr(path)}")


@pytest.fixture(scope="module")
def setup():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    devices = jax.devices()
    config = _tiny_config()
    t1 = BTSTrainer(config, mesh=make_mesh(devices[:1]))
    t8 = BTSTrainer(config, mesh=make_mesh(devices[:8]))
    batch = _batch(8)
    key = jax.random.PRNGKey(7)
    state = t1.init_state(batch, jax.random.PRNGKey(0))
    return t1, t8, batch, key, state


def _grads_and_loss(trainer, state, batch, key, ids):
    """The train step's loss_fn (trainer.py:140-151) under jax.grad, jitted
    with the trainer's shardings — gradient math without the adam update
    (adam's g/|g| normalization is ill-conditioned at g≈0 and would turn
    reduction-order noise into lr-scale param noise)."""
    wrapper, criterion = trainer.wrapper, trainer.criterion
    rcfg = trainer.renderer_cfg

    def loss_fn(params, batch, key):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        data, _ = wrapper.forward(variables, batch, key, ids, train=True,
                                  renderer_cfg=rcfg)
        loss, _ = criterion(data)
        return loss

    repl = replicated_sharding(trainer.mesh)
    fn = jax.jit(jax.value_and_grad(loss_fn),
                 in_shardings=(repl, batch_sharding(trainer.mesh), repl))
    sharded = shard_batch(batch, trainer.mesh)
    loss, grads = fn(state.params, sharded, key)
    return float(loss), jax.device_get(grads)


def test_grads_match_across_device_counts(setup):
    """An 8-device data-parallel gradient == the 1-device gradient on the
    same global batch (the DDP guarantee)."""
    t1, t8, batch, key, state = setup
    ids = t1.wrapper.select_views(np.random.default_rng(0), 3, training=True)
    loss1, g1 = _grads_and_loss(t1, state, batch, key, ids)
    loss8, g8 = _grads_and_loss(t8, state, batch, key, ids)
    assert abs(loss1 - loss8) <= 1e-6 * max(1.0, abs(loss1))
    # BN normalizes by global-batch statistics whose cross-device sums
    # legally reassociate; the noise compounds through the depth of the
    # encoder. Observed worst case 0.3% of leaf max — gate at 1%, two
    # orders below a missing-psum signature (8x).
    _allclose_tree(g1, g8, rtol=1e-3, atol_of_max=1e-2,
                   what="grads 1dev vs 8dev")


def test_train_step_params_match_across_device_counts(setup):
    """The FULL compiled train step (grad + adam) updates params identically
    (to adam's conditioning of reduction noise) on 1 vs 8 devices."""
    t1, t8, batch, key, state = setup
    outs = []
    for tr in (t1, t8):
        tr.np_rng = np.random.default_rng(5)   # same view selection
        sharded = shard_batch(batch, tr.mesh)
        # donate_argnums=(0,) consumes state: re-init per trainer from the
        # same PRNGKey (init is deterministic).
        st = tr.init_state(sharded, jax.random.PRNGKey(0))
        new_state, loss_dict = tr.train_step(st, sharded, key, 0)
        outs.append((float(loss_dict["loss"]),
                     jax.device_get(new_state.params)))
    (loss1, p1), (loss8, p8) = outs
    assert abs(loss1 - loss8) <= 1e-6 * max(1.0, abs(loss1))
    # adam's first-step update is ~lr*sign(g): where |g| sits at reduction-
    # noise scale the sign is ill-conditioned, so individual elements may
    # legally differ by up to ~2*lr. The invariant that survives adam's
    # normalization: every difference is bounded by the step size, and only
    # a vanishing fraction of elements is affected (observed 0.035%). A
    # per-device RNG fork or a sliced batch changes the gradient DIRECTION
    # and flips a large fraction of signs -> fails both bounds.
    lr = t1.config["learning_rate"]
    total = flipped = 0
    max_diff = 0.0
    for la, lb in zip(jax.tree_util.tree_leaves(p1),
                      jax.tree_util.tree_leaves(p8)):
        diff = np.abs(np.asarray(la) - np.asarray(lb))
        total += diff.size
        flipped += int((diff > 0.5 * lr).sum())
        max_diff = max(max_diff, float(diff.max()))
    assert max_diff < 3 * lr, f"update diff {max_diff} exceeds adam bound"
    assert flipped / total < 5e-3, \
        f"{flipped}/{total} params moved differently (>{0.5 * lr})"


def test_ray_sharded_render_matches_unsharded(setup):
    """Full-frame render with rays sharded over the mesh == the unsharded
    render (the eval-time sharding used by dryrun_multichip)."""
    t1, t8, batch, key, state = setup
    from behindthescenes_tpu import renderer as renderer_lib
    from behindthescenes_tpu.models.bts import BTSNet
    from behindthescenes_tpu.ray_sampler import ImageRaySampler

    net = t1.net
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    sampler = ImageRaySampler(3.0, 80.0, height=H, width=W)
    eval_batch = _batch(1, v=2)
    rcfg = t1.renderer_cfg
    mesh = make_mesh_2d(jax.devices()[:8], data=1)

    def render(variables, images, projs, poses, key, constrain):
        grid = net.apply(variables, images, projs, poses, ids_encoder=[0],
                         ids_render=[0, 1], method=BTSNet.encode)
        rays, _ = sampler.sample(None, None, poses[:, :1], projs[:, :1])
        if constrain:
            rays = jax.lax.with_sharding_constraint(rays, ray_sharding(mesh))

        def query_fn(xyz, coarse):
            return net.apply(variables, grid, xyz, coarse=coarse,
                             method=BTSNet.query)

        out = renderer_lib.render_rays(query_fn, rays, key, rcfg)
        return out["coarse"]["depth"]

    args = (variables, eval_batch["imgs"], eval_batch["projs"],
            eval_batch["poses"], key)
    repl = replicated_sharding(mesh)
    d_sharded = jax.jit(
        lambda *a: render(*a, constrain=True),
        in_shardings=(repl,) * 5, out_shardings=ray_sharding(mesh))(*args)
    with jax.default_device(jax.devices()[0]):
        d_single = jax.jit(lambda *a: render(*a, constrain=False))(*args)
    np.testing.assert_allclose(np.asarray(d_sharded), np.asarray(d_single),
                               rtol=1e-5, atol=1e-5)
