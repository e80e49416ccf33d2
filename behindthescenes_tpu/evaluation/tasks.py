"""Evaluation task wiring (reference models/bts/evaluator*.py evaluation()
entry points)."""
from __future__ import annotations

import jax.numpy as jnp

from behindthescenes_tpu import renderer as renderer_lib
from behindthescenes_tpu.datasets.factory import make_test_dataset
from behindthescenes_tpu.datasets.loader import DataLoader
from behindthescenes_tpu.evaluation.harness import (base_evaluation,
                                                    load_eval_variables)
from behindthescenes_tpu.models.bts import BTSNet


def _get_dataflow(config):
    ds = make_test_dataset(config["data"])
    if hasattr(ds, "return_depth"):
        ds.return_depth = True
    return DataLoader(ds, batch_size=1,
                      num_workers=config.get("num_workers", 2))


def _net_and_cfg(config):
    net = BTSNet.from_conf(config["model_conf"],
                           compute_dtype=jnp.bfloat16
                           if config.get("bf16", True) else jnp.float32)
    rcfg = renderer_lib.RendererConfig.from_conf(config.get("renderer", {}))
    return net, rcfg


def evaluate_depth(config):
    from behindthescenes_tpu.evaluation.depth import DepthEvaluator

    def make_evaluator(config, first_batch):
        net, rcfg = _net_and_cfg(config)
        variables = load_eval_variables(config, net, first_batch)
        ev = DepthEvaluator(net, rcfg, config["model_conf"],
                            eval_nvs=config.get("mode") == "nvs")
        return ev, variables

    return base_evaluation(config, _get_dataflow, make_evaluator)


def evaluate_nvs(config):
    from behindthescenes_tpu.evaluation.nvs import NVSEvaluator

    def make_evaluator(config, first_batch):
        net, rcfg = _net_and_cfg(config)
        variables = load_eval_variables(config, net, first_batch)
        ev = NVSEvaluator(net, rcfg, config["model_conf"],
                          eval_resolution=config.get("eval_resolution"))
        return ev, variables

    return base_evaluation(config, _get_dataflow, make_evaluator)


def evaluate_lidar_occ(config):
    from behindthescenes_tpu.evaluation.lidar_occ import LidarOccEvaluator

    dataset_holder = {}

    def get_dataflow(config):
        ds = make_test_dataset(config["data"])
        dataset_holder["ds"] = ds
        return DataLoader(ds, batch_size=1,
                          num_workers=config.get("num_workers", 2))

    def make_evaluator(config, first_batch):
        net, rcfg = _net_and_cfg(config)
        variables = load_eval_variables(config, net, first_batch)
        ev = LidarOccEvaluator(net, rcfg, config["model_conf"],
                               dataset_holder["ds"])
        return ev, variables

    return base_evaluation(config, get_dataflow, make_evaluator)


def evaluate_3dbb(config):
    from behindthescenes_tpu.evaluation.bbox_occ import BBoxOccEvaluator

    dataset_holder = {}

    def get_dataflow(config):
        ds = make_test_dataset(config["data"])
        dataset_holder["ds"] = ds
        return DataLoader(ds, batch_size=1,
                          num_workers=config.get("num_workers", 2))

    def make_evaluator(config, first_batch):
        net, rcfg = _net_and_cfg(config)
        variables = load_eval_variables(config, net, first_batch)
        ev = BBoxOccEvaluator(net, rcfg, config["model_conf"],
                              dataset_holder["ds"])
        return ev, variables

    return base_evaluation(config, get_dataflow, make_evaluator)
