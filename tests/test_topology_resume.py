"""Topology-change checkpoint resume: save on an N-device mesh, restore
and continue on a different device count.

This is the checkpoint property real TPU pod operations exercise (resume a
v5e-8 run on v5e-1 for debugging, or scale a run up): the reference gets it
via torch.load's device-agnostic state dicts (reference
utils/base_trainer.py:315-336); ours must come from orbax restoring into a
target whose shardings belong to the CURRENT mesh, regardless of the mesh
the save ran under (training/harness.py:158-174 CheckpointManager.restore,
137-156 restore_replicated).

Runs on the virtual 8-device CPU mesh (tests/conftest.py)."""
import os
import sys
import tempfile

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from behindthescenes_tpu.parallel.mesh import make_mesh, shard_batch
from behindthescenes_tpu.training.harness import CheckpointManager
from behindthescenes_tpu.training.trainer import BTSTrainer
from tests.test_multidevice_equiv import _batch, _tiny_config


def _params_equal(a, b):
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def _roundtrip(src_ndev: int, dst_ndev: int, tmpdir: str):
    """Train a step on src mesh, checkpoint, restore on dst mesh, verify
    bit-identical params/opt_state, then continue a step on dst."""
    devices = jax.devices()
    config = _tiny_config()
    batch = _batch(8)
    key = jax.random.PRNGKey(11)

    t_src = BTSTrainer(config, mesh=make_mesh(devices[:src_ndev]))
    t_src.np_rng = np.random.default_rng(2)
    st = t_src.init_state(shard_batch(batch, t_src.mesh),
                          jax.random.PRNGKey(0))
    st, _ = t_src.train_step(st, shard_batch(batch, t_src.mesh), key, 0)
    saved_params = jax.device_get(st.params)
    ckpt_dir = os.path.join(tmpdir, f"ckpt_{src_ndev}to{dst_ndev}")
    CheckpointManager(ckpt_dir).save(1, st)
    del t_src, st

    t_dst = BTSTrainer(config, mesh=make_mesh(devices[:dst_ndev]))
    t_dst.np_rng = np.random.default_rng(2)
    st2 = t_dst.init_state(shard_batch(batch, t_dst.mesh),
                           jax.random.PRNGKey(9))       # different init
    st2, extra = CheckpointManager(ckpt_dir).restore(st2)
    assert int(st2.step) == 1

    # Restored params are the saved ones, bit-exact, and live on the dst
    # mesh's devices (a restore that silently kept the save-time sharding
    # would crash or pin to missing devices on a real topology change).
    _params_equal(saved_params, jax.device_get(st2.params))
    for leaf in jax.tree_util.tree_leaves(st2.params):
        leaf_devs = {d.id for d in leaf.devices()}
        assert leaf_devs <= {d.id for d in devices[:dst_ndev]}, \
            (leaf_devs, dst_ndev)

    # The run continues on the new topology.
    st3, loss_dict = t_dst.train_step(
        st2, shard_batch(batch, t_dst.mesh), jax.random.PRNGKey(12), 1)
    assert np.isfinite(float(loss_dict["loss"]))
    assert int(st3.step) == 2
    return jax.device_get(st3.params)


@pytest.mark.skipif(jax.device_count() < 8,
                    reason="needs the 8-device virtual CPU mesh")
def test_resume_8dev_to_1dev(tmp_path):
    _roundtrip(8, 1, str(tmp_path))


@pytest.mark.skipif(jax.device_count() < 8,
                    reason="needs the 8-device virtual CPU mesh")
def test_resume_1dev_to_8dev(tmp_path):
    _roundtrip(1, 8, str(tmp_path))
