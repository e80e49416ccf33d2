"""Evaluator tests on synthetic data + metric self-consistency."""
import jax
import jax.numpy as jnp
import numpy as np

from behindthescenes_tpu import renderer as rlib
from behindthescenes_tpu.datasets.synthetic import SyntheticBoxDataset, collate
from behindthescenes_tpu.evaluation import metrics as M
from behindthescenes_tpu.evaluation.depth import DepthEvaluator
from behindthescenes_tpu.evaluation.nvs import NVSEvaluator
from behindthescenes_tpu.models.bts import BTSNet


def test_uniform_filter_matches_naive():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((12, 15))
    got = M._uniform_filter(img, 7)
    h, w = img.shape
    naive = np.zeros((h - 6, w - 6))
    for i in range(h - 6):
        for j in range(w - 6):
            naive[i, j] = img[i:i + 7, j:j + 7].mean()
    np.testing.assert_allclose(got, naive, atol=1e-10)


def test_ssim_psnr_properties():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (32, 40, 3))
    assert abs(M.ssim(img, img) - 1.0) < 1e-9
    assert M.psnr(img, img) == float("inf")
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1)
    s = M.ssim(noisy, img)
    p = M.psnr(noisy, img)
    assert 0 < s < 1
    assert 15 < p < 25  # sigma=0.1 noise -> ~20dB


def _tiny_net(h, w):
    return BTSNet(
        z_near=1.0, z_far=40.0,
        encoder_conf={"type": "dummy", "size": (h, w), "d_out": 8},
        code_conf={"num_freqs": 4, "freq_factor": 1.5},
        mlp_coarse_conf={"type": "resnet", "n_blocks": 0, "d_hidden": 16},
        mlp_fine_conf={"type": "empty"},
        learn_empty=False,
    )


def test_depth_evaluator_synthetic():
    h, w = 24, 32
    ds = SyntheticBoxDataset(length=2, frame_count=2, height=h, width=w,
                             return_depth=True)
    batch = collate([ds[0]])
    net = _tiny_net(h, w)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.asarray(batch["imgs"]),
                         jnp.asarray(batch["projs"]),
                         jnp.asarray(batch["poses"]),
                         jnp.zeros((1, 8, 3)))
    cfg = rlib.RendererConfig(n_coarse=12, lindisp=True, hard_alpha_cap=True)
    for scaling in (None, "median", "l2"):
        ev = DepthEvaluator(net, cfg, {"z_near": 1.0, "z_far": 40.0,
                                       "depth_scaling": scaling},
                            eval_nvs=True)
        out = ev.evaluate(variables, batch)
        keys = {"abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3",
                "ssim", "psnr"}
        assert keys <= set(out)
        assert all(np.isfinite(v) for v in out.values()), (scaling, out)


def test_nvs_evaluator_synthetic():
    h, w = 24, 32
    ds = SyntheticBoxDataset(length=1, frame_count=3, height=h, width=w,
                             return_depth=False)
    batch = collate([ds[0]])
    net = _tiny_net(h, w)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.asarray(batch["imgs"]),
                         jnp.asarray(batch["projs"]),
                         jnp.asarray(batch["poses"]),
                         jnp.zeros((1, 8, 3)))
    cfg = rlib.RendererConfig(n_coarse=8, lindisp=True, hard_alpha_cap=True)
    ev = NVSEvaluator(net, cfg, {"z_near": 1.0, "z_far": 40.0})
    out = ev.evaluate(variables, batch)
    assert set(out) == {"psnr", "ssim"}
    assert np.isfinite(list(out.values())).all()


def test_load_eval_variables_resolves_run_step_and_npz(tmp_path):
    """The eval CLI's checkpoint resolver accepts an orbax RUN dir, an
    explicit STEP dir (…/checkpoints/15000 — regression: this path was
    documented but crashed in restore_replicated), and an .npz export —
    all returning the same params."""
    from behindthescenes_tpu.evaluation.harness import load_eval_variables
    from behindthescenes_tpu.training.harness import CheckpointManager
    from behindthescenes_tpu.training.trainer import TrainState
    from behindthescenes_tpu.utils.io import save_params_npz

    h, w = 24, 32
    ds = SyntheticBoxDataset(length=1, frame_count=2, height=h, width=w)
    batch = collate([ds[0]])
    net = _tiny_net(h, w)
    variables = net.init(jax.random.PRNGKey(3),
                         jnp.asarray(batch["imgs"]),
                         jnp.asarray(batch["projs"]),
                         jnp.asarray(batch["poses"]),
                         jnp.zeros((1, 8, 3)))
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=None, step=jnp.asarray(7))
    run_dir = tmp_path / "run"
    CheckpointManager(str(run_dir / "checkpoints")).save(7, state)
    npz = tmp_path / "w.npz"
    save_params_npz(str(npz), {"params": variables["params"],
                               "batch_stats":
                                   variables.get("batch_stats", {})})

    ref = {jax.tree_util.keystr(kp): np.asarray(leaf) for kp, leaf in
           jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
    for path in (str(run_dir), str(run_dir / "checkpoints"),
                 str(run_dir / "checkpoints" / "7"), str(npz)):
        out = load_eval_variables({"checkpoint": path}, net, batch)
        got = {jax.tree_util.keystr(kp): np.asarray(leaf) for kp, leaf in
               jax.tree_util.tree_flatten_with_path(out["params"])[0]}
        assert set(got) == set(ref), (path, set(got) ^ set(ref))
        for k in ref:
            # npz exports are f16 (save_params_npz), so tolerance sits at
            # f16 quantization; orbax restores are exact well inside it.
            np.testing.assert_allclose(got[k], ref[k], atol=2e-3,
                                       err_msg=f"{path}: {k}")
