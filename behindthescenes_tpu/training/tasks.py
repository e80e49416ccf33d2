"""Task definitions: dataflow + harness glue per workload
(reference models/bts/trainer.py:355-427 and trainer_overfit.py:72-208).
"""
from __future__ import annotations

import copy

from behindthescenes_tpu.datasets.factory import make_datasets
from behindthescenes_tpu.datasets.loader import DataLoader
from behindthescenes_tpu.training.harness import base_training
from behindthescenes_tpu.training.trainer import BTSTrainer


def bts_get_dataflow(config):
    """(reference models/bts/trainer.py:359-392)."""
    train_ds, test_ds = make_datasets(config["data"])

    # Per-host dataset sharding replaces DistributedSampler (SURVEY §5.8).
    host_shard = config["data"].get("host_shard")
    if host_shard:
        from behindthescenes_tpu.datasets.loader import shard_for_host
        train_ds = shard_for_host(train_ds, *host_shard)

    # Eval datasets use a single prediction frame + GT depth.
    test_ds = copy.copy(test_ds)
    if hasattr(test_ds, "frame_count"):
        test_ds.frame_count = config["data"].get("eval_frame_count", 2)
    if hasattr(test_ds, "return_depth"):
        test_ds.return_depth = True
    if hasattr(test_ds, "length"):
        test_ds.length = min(getattr(test_ds, "length", 256), 256)

    vis_ds = copy.copy(test_ds)
    if hasattr(vis_ds, "length"):
        vis_ds.length = 1

    nw = config.get("num_workers", 2)
    train_loader = DataLoader(train_ds, batch_size=config["batch_size"],
                              shuffle=True, drop_last=True, num_workers=nw,
                              seed=config.get("seed", 0))
    test_loader = DataLoader(test_ds, batch_size=1, num_workers=nw)
    vis_loader = DataLoader(vis_ds, batch_size=1, num_workers=0)
    return train_loader, test_loader, vis_loader


def bts_training(config):
    trainer = BTSTrainer(config)
    visualize = None
    on_iteration = None
    on_validation = None
    writer = None
    if config.get("tensorboard", True):
        try:
            from torch.utils.tensorboard import SummaryWriter
            import os
            writer = SummaryWriter(os.path.join(
                config.get("output_path", "out/run"), "tb"))
            from behindthescenes_tpu.training.visualize import \
                make_tb_visualizer
            visualize = make_tb_visualizer(writer)

            log_tb_every = config.get("log_tb_train_every_iters", 50)

            def on_iteration(it, state, loss_dict):
                if log_tb_every > 0 and it % log_tb_every == 0:
                    for k, v in loss_dict.items():
                        writer.add_scalar(f"train/{k}", float(v),
                                          global_step=it)

            def on_validation(it, metrics):
                for k, v in metrics.items():
                    writer.add_scalar(f"val/{k}", float(v), global_step=it)
        except ImportError:
            pass
    try:
        return base_training(config, bts_get_dataflow, trainer=trainer,
                             visualize=visualize, on_iteration=on_iteration,
                             on_validation=on_validation)
    finally:
        # SummaryWriter buffers events; without a close, scalars written
        # near the end of the run never reach disk.
        if writer is not None:
            writer.close()


class _CachedBatchLoader:
    """Single pre-collated batch, repeated — the overfit debug dataflow
    (reference trainer_overfit.py:36-59)."""

    def __init__(self, batch, iters_per_epoch: int):
        self.batch = batch
        self.iters = iters_per_epoch

    def __len__(self):
        return self.iters

    def __iter__(self):
        for _ in range(self.iters):
            yield self.batch

    def set_epoch(self, epoch):
        pass


def bts_overfit_training(config):
    """Overfit workload: EncoderDummy + one cached batch
    (reference trainer_overfit.py:62-208)."""
    from behindthescenes_tpu.datasets.loader import DataLoader as _DL
    train_ds, _ = make_datasets(config["data"])
    batch = next(iter(_DL(train_ds, batch_size=config.get("batch_size", 1),
                          num_workers=0)))
    h, w = batch["imgs"].shape[2:4]

    config = copy.deepcopy(config)
    config["model_conf"]["encoder"] = {
        "type": "dummy", "size": (h, w),
        "d_out": config["model_conf"]["encoder"].get("d_out", 64)}
    config["model_conf"]["flip_augmentation"] = False

    loader = _CachedBatchLoader(batch,
                                config.get("num_iters_per_epoch", 100))

    def dataflow(_):
        return loader, None, None

    trainer = BTSTrainer(config)
    return base_training(config, dataflow, trainer=trainer)
