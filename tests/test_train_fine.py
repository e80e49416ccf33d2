"""Training with an importance-sampled fine pass — including the
`fine_reuse_coarse` TPU formulation (PERF.md finding 14) — must run under
jax.grad and drive the loss down, matching the plain re-query fine pass's
training dynamics."""
import jax
import jax.numpy as jnp
import numpy as np

from behindthescenes_tpu.datasets.synthetic import SyntheticBoxDataset, collate
from behindthescenes_tpu.parallel.mesh import make_mesh
from behindthescenes_tpu.training.trainer import BTSTrainer

from test_train_overfit import _overfit_config


def _run(h, w, batch, n_steps, renderer_update):
    config = _overfit_config(h, w)
    config["renderer"].update(renderer_update)
    trainer = BTSTrainer(config, mesh=make_mesh(jax.devices()[:1]))
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(batch, key)
    losses = []
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        state, loss_dict = trainer.train_step(state, batch, sub, i)
        losses.append(float(loss_dict["loss"]))
    return np.asarray(losses), loss_dict


def test_fine_reuse_coarse_trains():
    h, w = 24, 32
    ds = SyntheticBoxDataset(length=1, frame_count=4, height=h, width=w)
    batch = collate([ds[0]])
    del batch["depths"]
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses, loss_dict = _run(h, w, batch, 80,
                             {"n_coarse": 8, "n_fine": 8,
                              "fine_reuse_coarse": True})
    assert np.isfinite(losses).all(), losses
    assert "loss_rgb_fine" in loss_dict and \
        float(loss_dict["loss_rgb_fine"]) > 0.0
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.85, losses


def test_fine_reuse_coarse_step_matches_requery():
    """One gradient step with fine_reuse_coarse equals the reference-style
    full re-query step (same RNG): the merged-composite formulation is
    output- AND gradient-identical when noise_std == 0."""
    h, w = 24, 32
    ds = SyntheticBoxDataset(length=1, frame_count=4, height=h, width=w)
    batch = collate([ds[0]])
    del batch["depths"]
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    la, _ = _run(h, w, batch, 12, {"n_coarse": 8, "n_fine": 8,
                                   "fine_reuse_coarse": True})
    lb, _ = _run(h, w, batch, 12, {"n_coarse": 8, "n_fine": 8,
                                   "fine_reuse_coarse": False})
    np.testing.assert_allclose(la, lb, rtol=2e-3, atol=2e-4)
