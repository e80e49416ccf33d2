"""Trainer core: TrainState, the pjit-compiled train/eval steps, and the
task factory (reference models/bts/trainer.py:355-427 + the step logic of
utils/base_trainer.py:270-307).

The step is one compiled function: forward (encode→sample→render), loss,
backward, optimizer update — including the cross-device gradient reduction,
which XLA inserts from the shardings (batch: P('data'), params: replicated).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from behindthescenes_tpu import renderer as renderer_lib
from behindthescenes_tpu.losses import ReconstructionLoss
from behindthescenes_tpu.models.bts import BTSNet
from behindthescenes_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                               replicated_sharding)
from behindthescenes_tpu.training.schedule import make_lr_schedule
from behindthescenes_tpu.training.view_select import ViewIds
from behindthescenes_tpu.training.wrapper import (BTSWrapper,
                                                  compute_depth_metrics)


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(config: dict):
    lr = config.get("learning_rate", 1e-4)
    schedule = make_lr_schedule(config.get("scheduler", {}), lr)
    tx = optax.adam(schedule)
    accumulate = config.get("accumulate_steps", 1)
    if accumulate > 1:
        # Gradient accumulation: reference-equivalent effective batch sizes
        # (e.g. batch 16 = 2 x micro-batch 8) within 16GB HBM.
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx, schedule


def _alternating_mask(params, train_encoder):
    """Zero updates for the frozen half when alternating encoder/MLP training
    (reference models/bts/trainer.py:101-112). `train_encoder` is traced."""
    def mask(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        in_encoder = "encoder" in names
        in_mlp = any("mlp_coarse" in str(n) for n in names)
        if in_encoder:
            return leaf * train_encoder
        if in_mlp:
            return leaf * (1.0 - train_encoder)
        return leaf
    return jax.tree_util.tree_map_with_path(mask, params)


class BTSTrainer:
    """Builds and owns the compiled steps for one task config."""

    def __init__(self, config: dict, mesh=None, compute_dtype=None):
        self.config = config
        if mesh is None:
            # The data axis must divide the (micro-)batch; with more devices
            # than batch (e.g. CI batch 2 on an 8-device CPU mesh) use the
            # largest divisor and leave the rest idle rather than crash.
            import math
            ndev = len(jax.devices())
            # config batch_size is per host; the global batch is the
            # concatenation of every host's loader batch (mesh.shard_batch).
            global_batch = int(config.get("batch_size", 1)) \
                * jax.process_count()
            use = math.gcd(global_batch, ndev)
            if use != ndev:
                import logging
                logging.getLogger(__name__).warning(
                    "batch_size %s not divisible by %d devices; data-parallel"
                    " over %d device(s)", config.get("batch_size"), ndev, use)
            mesh = make_mesh(jax.devices()[:use])
        self.mesh = mesh
        model_conf = config["model_conf"]
        if compute_dtype is None:
            # bf16 activations by default on TPU (reference gates AMP off on
            # xla-tpu, train.py:26-27; bf16 needs no loss scaling). Params,
            # BN stats, and the loss stay f32.
            compute_dtype = jnp.bfloat16 if config.get("bf16", True) \
                else jnp.float32
        self.net = BTSNet.from_conf(model_conf, compute_dtype=compute_dtype)
        self.renderer_cfg = renderer_lib.RendererConfig.from_conf(
            config.get("renderer", {}))
        self.scheduler = renderer_lib.SampleScheduler(self.renderer_cfg)
        self.wrapper = BTSWrapper(self.net, self.renderer_cfg, model_conf)
        self.criterion = ReconstructionLoss.from_conf(
            config.get("loss", {}),
            model_conf.get("use_automasking", False))
        self.tx, self.lr_schedule = make_optimizer(config)
        self.alternating_ratio = model_conf.get("alternating_ratio", None)
        self._train_step_cache = {}
        self._eval_step_cache = {}
        self.np_rng = np.random.default_rng(config.get("seed", 0))

    # ------------------------------------------------------------------ init
    def init_state(self, sample_batch: dict, key) -> TrainState:
        # Params depend only on shapes + key, so init runs on host-local
        # stand-ins built from the sample batch's shapes: on multi-host
        # runs the sample batch's leaves are global (cross-process) arrays,
        # and eager ops on those are not allowed outside jit. Benign values
        # (identity poses, pinhole-ish intrinsics) keep the init trace free
        # of 1/0s under jax_debug_nans.
        n, v = sample_batch["imgs"].shape[:2]
        images = jnp.zeros(sample_batch["imgs"].shape, jnp.float32)
        poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                 sample_batch["poses"].shape)
        projs = jnp.broadcast_to(
            jnp.asarray([[0.6, 0, 0], [0, 1.8, 0], [0, 0, 1]],
                        dtype=jnp.float32), sample_batch["projs"].shape)
        xyz = jnp.zeros((n, 8, 3))
        variables = self.net.init(key, images, projs, poses, xyz)
        enc_conf = self.config["model_conf"].get("encoder", {})
        if enc_conf.get("pretrained") or enc_conf.get("cp_location"):
            from behindthescenes_tpu.import_torch import \
                apply_pretrained_encoder
            variables = apply_pretrained_encoder(dict(variables), enc_conf)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=opt_state, step=jnp.asarray(0))

    # ------------------------------------------------------------ train step
    def _build_train_step(self, renderer_cfg):
        wrapper = self.wrapper
        criterion = self.criterion
        tx = self.tx
        alternating = self.alternating_ratio is not None

        def train_step(state: TrainState, batch, key, ids: ViewIds,
                       train_encoder):
            if batch["imgs"].dtype != jnp.float32:
                # Images may arrive width-reduced over the host->device
                # link (HarnessConfig.transfer_dtype); all math stays f32.
                batch = {**batch,
                         "imgs": batch["imgs"].astype(jnp.float32)}

            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                data, new_vars = wrapper.forward(
                    variables, batch, key, ids, train=True,
                    renderer_cfg=renderer_cfg)
                with jax.named_scope("loss_computation"):
                    loss, loss_dict = criterion(data)
                return loss, (loss_dict, new_vars.get("batch_stats", {}))

            grads, (loss_dict, new_bs) = jax.grad(
                loss_fn, has_aux=True)(state.params)
            if alternating:
                grads = _alternating_mask(grads, train_encoder)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            if alternating:
                # Also mask the updates: Adam momentum would otherwise keep
                # moving "frozen" params (torch requires_grad=False skips
                # them entirely, reference trainer.py:101-112).
                updates = _alternating_mask(updates, train_encoder)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(params=new_params, batch_stats=new_bs,
                                   opt_state=new_opt, step=state.step + 1)
            return new_state, loss_dict

        repl = replicated_sharding(self.mesh)
        data_shard = batch_sharding(self.mesh)
        return jax.jit(
            train_step,
            in_shardings=(repl, data_shard, repl, repl, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    def train_step(self, state: TrainState, batch, key, step_idx: int):
        """Host-side wrapper: schedules sample counts, view selection,
        alternating flag; dispatches the compiled step."""
        cfg = self.scheduler.step()
        cache_key = (cfg.n_coarse, cfg.n_fine)
        if cache_key not in self._train_step_cache:
            self._train_step_cache[cache_key] = self._build_train_step(cfg)
        v = batch["imgs"].shape[1]
        ids = self.wrapper.select_views(self.np_rng, v, training=True)
        if self.alternating_ratio is not None:
            phase = step_idx % (self.alternating_ratio + 1)
            train_encoder = jnp.asarray(
                1.0 if phase < self.alternating_ratio else 0.0)
        else:
            train_encoder = jnp.asarray(1.0)
        return self._train_step_cache[cache_key](state, batch, key, ids,
                                                 train_encoder)

    # ------------------------------------------------------------- eval step
    def _build_eval_step(self, renderer_cfg, with_depth_metrics):
        wrapper = self.wrapper

        def eval_step(state: TrainState, batch, key, ids: ViewIds):
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            data, _ = wrapper.forward(variables, batch, key, ids, train=False,
                                      renderer_cfg=renderer_cfg)
            out = {"depth": data["fine"][0]["depth"],
                   "rgb": data["fine"][0]["rgb"]}
            if with_depth_metrics:
                # Metric scalars must be fully replicated: the harness
                # float()s them on every host, which requires an
                # addressable (replicated) value on multi-host runs.
                out["metrics"] = jax.lax.with_sharding_constraint(
                    compute_depth_metrics(data),
                    replicated_sharding(self.mesh))
            return out

        return jax.jit(eval_step)

    def eval_step(self, state: TrainState, batch, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        v = batch["imgs"].shape[1]
        with_depth = "depths" in batch and batch["depths"] is not None
        cache_key = (v, with_depth, batch["imgs"].shape)
        if cache_key not in self._eval_step_cache:
            self._eval_step_cache[cache_key] = self._build_eval_step(
                self.renderer_cfg, with_depth)
        ids = self.wrapper.select_views(self.np_rng, v, training=False)
        return self._eval_step_cache[cache_key](state, batch, key, ids)
