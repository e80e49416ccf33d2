"""Evaluation harness (reference utils/base_evaluator.py:15-155): checkpoint
loading (orbax runs or imported torch checkpoints), the metric loop, and
periodic printing."""
from __future__ import annotations

import glob
import logging
import os
from typing import Callable

import jax
import jax.numpy as jnp

from behindthescenes_tpu.training.harness import MeanMetric

log = logging.getLogger("bts_tpu.eval")


def load_eval_variables(config: dict, net, sample_batch):
    """Resolve checkpoint: `checkpoint` may point to an orbax run dir, an
    orbax step dir, or a reference `training*.pt` torch file."""
    path = config.get("checkpoint")
    images = jnp.asarray(sample_batch["imgs"])
    template = net.init(jax.random.PRNGKey(0), images,
                        jnp.asarray(sample_batch["projs"]),
                        jnp.asarray(sample_batch["poses"]),
                        jnp.zeros((images.shape[0], 8, 3)))
    if not path:
        log.warning("no checkpoint configured — evaluating random init")
        return template

    if os.path.isdir(path):
        from behindthescenes_tpu.training.harness import CheckpointManager
        norm = os.path.normpath(path)
        base = os.path.basename(norm)
        if base.isdigit() and os.path.isdir(os.path.join(norm, "default")):
            # An explicit orbax STEP dir (…/checkpoints/15000): restore
            # that exact step from the enclosing run dir.
            mgr = CheckpointManager(os.path.dirname(norm))
            restored = mgr.restore_replicated(step=int(base))
            log.info("restored checkpoint step %s from %s", base, norm)
            return {"params": restored["params"],
                    "batch_stats": restored.get("batch_stats", {})}
        candidates = sorted(glob.glob(os.path.join(path, "checkpoints")))
        ckpt_dir = candidates[0] if candidates else path
        mgr = CheckpointManager(ckpt_dir)
        restored = mgr.restore_replicated()
        log.info("restored checkpoint step %s from %s", mgr.latest_step(),
                 ckpt_dir)
        return {"params": restored["params"],
                "batch_stats": restored.get("batch_stats", {})}

    if path.endswith(".npz"):
        from behindthescenes_tpu.utils.io import load_params_npz
        variables = load_params_npz(path)
        log.info("loaded npz weights from %s", path)
        return {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})}

    if path.endswith(".pt"):
        from behindthescenes_tpu.import_torch import (import_bts_checkpoint,
                                                      validate_against_template)
        enc_conf = config["model_conf"]["encoder"]
        params, batch_stats = import_bts_checkpoint(
            path, resnet_layers=enc_conf.get("resnet_layers", 50),
            scales=tuple(enc_conf.get("scales", (0, 1, 2, 3))))
        validate_against_template(params, template["params"])
        return {"params": params, "batch_stats": batch_stats}
    raise ValueError(f"Unrecognized checkpoint: {path}")


def base_evaluation(config: dict, get_dataflow: Callable,
                    make_evaluator: Callable) -> dict:
    """Run the metric loop; returns the final metric means."""
    if not log.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(message)s"))
        log.addHandler(h)
        log.setLevel(logging.INFO)
        log.propagate = False

    test_loader = get_dataflow(config)
    first_batch = next(iter(test_loader))
    evaluator, variables = make_evaluator(config, first_batch)

    metrics: dict[str, MeanMetric] = {}
    for i, batch in enumerate(test_loader):
        out = evaluator.evaluate(variables, batch,
                                 key=jax.random.PRNGKey(i))
        for k, val in out.items():
            metrics.setdefault(k, MeanMetric()).update(float(val))
        if (i + 1) % config.get("log_every_iters", 10) == 0:
            log.info("[%d] %s", i + 1,
                     {k: round(m.compute(), 5) for k, m in metrics.items()})
    final = {k: m.compute() for k, m in metrics.items()}
    log.info("final: %s", {k: round(v, 5) for k, v in final.items()})
    return final
