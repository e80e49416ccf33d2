"""Every shipped config must compose (Hydra-style defaults resolution) and
carry the keys its entry point consumes (train.py / eval.py registries)."""
import glob
import os

import pytest

from behindthescenes_tpu.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*.yaml")))
TRAIN_MODELS = {"bts", "bts_overfit"}
EVAL_MODELS = {"bts", "bts_nvs", "bts_lidar", "bts_3dbb"}


@pytest.mark.parametrize("path", CONFIGS,
                         ids=[os.path.basename(p) for p in CONFIGS])
def test_config_composes(path):
    conf = load_config(path)
    name = os.path.basename(path)
    if name == "default.yaml":
        return
    assert conf.get("model") in TRAIN_MODELS | EVAL_MODELS, name
    assert "model_conf" in conf, name
    assert "data" in conf and "type" in conf["data"], name
    assert "renderer" in conf, name
    if name.startswith("eval_"):
        assert conf.get("model") in EVAL_MODELS, name
        assert "checkpoint" in conf, name
    else:
        # Training configs drive the optimizer + harness schedule.
        assert "learning_rate" in conf and "batch_size" in conf, name


def test_data_configs_compose():
    for path in sorted(glob.glob(os.path.join(REPO, "configs", "data",
                                              "*.yaml"))):
        conf = load_config(path)
        assert "type" in conf and "image_size" in conf, path
