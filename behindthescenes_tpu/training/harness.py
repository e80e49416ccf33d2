"""Training harness: the run loop with validation, visualization,
checkpointing, resume, and metric logging.

Re-design of reference utils/base_trainer.py:24-518 (ignite Engine/Events)
as a plain, inspectable loop: events are just code in order. Checkpoints are
orbax. Training-loss reductions compile into the train step (grad psum);
validation metrics accumulate per host and are summed across hosts in
`run_validation` before the final divide.
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
import signal
import time
from typing import Callable, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from behindthescenes_tpu.parallel.mesh import shard_batch
from behindthescenes_tpu.training.trainer import BTSTrainer, TrainState

log = logging.getLogger("bts_tpu")

# Graceful-shutdown flag (SURVEY §5.3). SIGTERM (cluster preemption,
# `timeout`, orchestrator stop) requests a checkpoint-and-clean-exit at the
# next iteration boundary instead of killing mid-step — a killed device
# process loses up to checkpoint_every iterations and (on remote-attached
# accelerators) can wedge the device session.
_stop_requested = False


def _request_stop(signum, frame):  # noqa: ARG001 (signal handler ABI)
    global _stop_requested
    _stop_requested = True
    log.info("signal %d received — checkpointing and exiting at the next "
             "iteration boundary", signum)


class MeanMetric:
    """NaN-skipping running mean (reference utils/metrics.py:11-41).

    Accumulates per-host (total, count); `run_validation` sums both across
    hosts before the final divide — the jax equivalent of the reference's
    `sync_all_reduce("SUM")` (utils/metrics.py:31)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    def update(self, value: float):
        if np.isnan(value):
            return
        self.total += float(value)
        self.count += 1

    def compute(self) -> float:
        return self.total / self.count if self.count else float("nan")


@dataclasses.dataclass
class HarnessConfig:
    output_path: str = "out/run"
    num_epochs: int = 1
    validate_every: int = 2000       # iterations
    visualize_every: int = 500
    checkpoint_every: int = 500
    log_every: int = 50
    stop_iteration: Optional[int] = None
    resume_from: Optional[str] = None
    save_best_metric: Optional[str] = None
    save_best_sign: int = -1          # -1: lower is better
    stop_on_nan_check_every: int = 0  # 1 = check every iteration
    debug_nans: bool = False          # jax_debug_nans (slow; debugging)
    profile_dir: Optional[str] = None  # jax.profiler trace output dir
    profile_steps: tuple = (10, 20)    # (start_iter, stop_iter)
    eval_use_iters: bool = True        # False: validate at epoch ends
    transfer_dtype: Optional[str] = None  # "bfloat16": ship imgs at half
    # width over the host->device link (cast back to f32 on device in the
    # train step; loss targets then carry bf16 (~2^-8 relative)
    # quantization — below 8-bit image noise, but off by default).

    @classmethod
    def from_conf(cls, conf: dict) -> "HarnessConfig":
        best = conf.get("save_best", {}) or {}
        return cls(
            output_path=conf.get("output_path", "out/run"),
            num_epochs=conf.get("num_epochs", 1),
            validate_every=conf.get("validate_every", 2000),
            visualize_every=conf.get("visualize_every", 500),
            checkpoint_every=conf.get("checkpoint_every", 500),
            log_every=conf.get("log_every_iters", 50),
            stop_iteration=conf.get("stop_iteration", None),
            resume_from=conf.get("resume_from", None),
            save_best_metric=best.get("metric"),
            save_best_sign=best.get("sign", -1),
            stop_on_nan_check_every=conf.get("stop_on_nan_check_every", 0),
            debug_nans=conf.get("debug_nans", False),
            profile_dir=conf.get("profile_dir", None),
            profile_steps=tuple(conf.get("profile_steps", (10, 20))),
            eval_use_iters=conf.get("eval_use_iters", True),
            transfer_dtype=conf.get("transfer_dtype", None),
        )


class CheckpointManager:
    """Orbax-backed checkpointing of {params, batch_stats, opt_state, step}
    plus host-side state (render scheduler), replacing ignite Checkpoint
    (reference utils/base_trainer.py:315-336)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, state: TrainState, extra: Optional[dict] = None):
        self.manager.save(step, args=ocp.args.StandardSave(
            {"params": state.params, "batch_stats": state.batch_stats,
             "opt_state": state.opt_state, "step": state.step}))
        if extra:
            with open(os.path.join(self.directory, f"extra_{step}.json"),
                      "w") as f:
                json.dump(extra, f)
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore_replicated(self, step: Optional[int] = None) -> dict:
        """Restore ignoring the saving topology: every leaf comes back
        replicated on the current devices (checkpoints saved on an 8-device
        mesh must load on 1 chip and vice versa)."""
        step = step if step is not None else self.manager.latest_step()
        item_dir = os.path.join(self.directory, str(step), "default")
        if not os.path.isdir(item_dir):
            # Tolerate non-canonical step dir names (e.g. zero-padded
            # "0015000"): match on integer value against the real listing.
            for d in sorted(os.listdir(self.directory)):
                if d.isdigit() and int(d) == int(step):
                    item_dir = os.path.join(self.directory, d, "default")
                    break
        ckptr = ocp.StandardCheckpointer()
        meta = ckptr.metadata(item_dir)
        tree = meta.item_metadata.tree if hasattr(meta, "item_metadata") \
            else meta
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

        def to_abstract(m):
            return jax.ShapeDtypeStruct(tuple(m.shape), m.dtype,
                                        sharding=sharding)

        target = jax.tree_util.tree_map(
            to_abstract, tree,
            is_leaf=lambda x: hasattr(x, "shape") and hasattr(x, "dtype"))
        return ckptr.restore(item_dir, target)

    def restore(self, state: TrainState, step: Optional[int] = None):
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return state, None
        target = {"params": state.params, "batch_stats": state.batch_stats,
                  "opt_state": state.opt_state, "step": state.step}
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(target))
        extra_path = os.path.join(self.directory, f"extra_{step}.json")
        extra = None
        if os.path.exists(extra_path):
            with open(extra_path) as f:
                extra = json.load(f)
        return TrainState(params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=restored["opt_state"],
                          step=restored["step"]), extra


def _device_prefetch(loader, mesh, depth: int = 2, transfer_dtype=None):
    """Yield batches already sharded onto the device mesh, with
    `depth`-deep lookahead.

    `jax.device_put` is asynchronous, so enqueuing the transfer of batch
    i+1 before blocking on batch i's step overlaps host->device traffic
    with compute. Over this environment's TCP relay a flagship batch is
    ~20 MB/step; serialized with the step it costs ~as much as the
    compiled step itself (PERF.md finding 9)."""
    from collections import deque
    buf = deque()
    for batch in loader:
        if transfer_dtype is not None and "imgs" in batch:
            # Host->device traffic is dominated by the image tensor; ship
            # it at reduced width and cast back to f32 in the train step
            # (BTSTrainer.train_step). Poses/projs/depths stay f32.
            batch = dict(batch)
            batch["imgs"] = np.asarray(batch["imgs"]).astype(transfer_dtype)
        buf.append(shard_batch(batch, mesh))
        while len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def base_training(config: dict, get_dataflow: Callable,
                  trainer: Optional[BTSTrainer] = None,
                  visualize: Optional[Callable] = None,
                  on_iteration: Optional[Callable] = None,
                  on_validation: Optional[Callable] = None) -> TrainState:
    """The run loop (reference utils/base_trainer.py:24-221 condensed).

    get_dataflow(config) -> (train_loader, val_loader, vis_loader).
    """
    hc = HarnessConfig.from_conf(config)
    os.makedirs(hc.output_path, exist_ok=True)
    # Configure our logger directly — the runtime may already own the root
    # logger's handlers, making basicConfig a no-op.
    if not log.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(message)s"))
        log.addHandler(handler)
        log.setLevel(logging.INFO)
        log.propagate = False
    log.info("config: %s", json.dumps(
        {k: v for k, v in config.items() if not isinstance(v, dict)},
        default=str))

    if hc.debug_nans:
        # NaN provenance (SURVEY §5.2: the rebuild gets this for free).
        jax.config.update("jax_debug_nans", True)

    trainer = trainer or BTSTrainer(config)
    train_loader, val_loader, vis_loader = get_dataflow(config)

    key = jax.random.PRNGKey(config.get("seed", 0))
    key, init_key = jax.random.split(key)
    sample_batch = shard_batch(next(iter(train_loader)), trainer.mesh)
    state = trainer.init_state(sample_batch, init_key)

    # Align hosts after the skewed per-host setup above (loader + eager
    # init compiles) — the managers below are the run's first
    # cross-host-synchronizing construct (see multihost_barrier docstring).
    from behindthescenes_tpu.platform import multihost_barrier
    multihost_barrier("post-init")

    ckpt = CheckpointManager(os.path.join(hc.output_path, "checkpoints"))
    best_ckpt = CheckpointManager(os.path.join(hc.output_path, "best"),
                                  max_to_keep=2)
    # Persist the best-metric VALUE alongside the best checkpoints so
    # segmented/auto-resumed runs (scripts/train_segmented.sh) continue the
    # comparison instead of overwriting a better earlier checkpoint with
    # the first validation of a new segment.
    best_value = None
    best_value_path = os.path.join(hc.output_path, "best", "best_value.json")
    if hc.save_best_metric and os.path.exists(best_value_path):
        try:
            with open(best_value_path) as f:
                prev = json.load(f)
            if prev.get("metric") == hc.save_best_metric:
                best_value = prev["signed_value"]
                log.info("resuming best %s tracker at signed value %.5f",
                         hc.save_best_metric, best_value)
        except Exception:                           # noqa: BLE001
            pass

    global _stop_requested
    _stop_requested = False
    try:  # signal.signal is main-thread-only; harness may run in a worker
        prev_sigterm = signal.signal(signal.SIGTERM, _request_stop)
    except ValueError:
        prev_sigterm = None

    if hc.resume_from:
        state, extra = CheckpointManager(hc.resume_from).restore(state)
        if extra and "render_sched" in extra:
            trainer.scheduler.load_state_dict(extra["render_sched"])
        log.info("resumed from %s at step %d", hc.resume_from,
                 int(state.step))
    elif ckpt.latest_step() is not None:
        state, extra = ckpt.restore(state)
        if extra and "render_sched" in extra:
            trainer.scheduler.load_state_dict(extra["render_sched"])
        log.info("auto-resumed at step %d", int(state.step))

    def finish(state, reason):
        if ckpt.latest_step() != it:  # don't double-save this step
            ckpt.save(it, state, extra={
                "render_sched": trainer.scheduler.state_dict()})
        if prev_sigterm is not None:
            try:
                signal.signal(signal.SIGTERM, prev_sigterm)
            except ValueError:
                pass
        log.info("stopping at iteration %d (%s), checkpoint saved", it,
                 reason)
        return state

    it = int(state.step)
    t_iter = time.time()
    for epoch in range(hc.num_epochs):
        if hasattr(train_loader, "set_epoch"):
            train_loader.set_epoch(epoch)
        for batch in _device_prefetch(train_loader, trainer.mesh,
                                      transfer_dtype=hc.transfer_dtype):
            t_data = time.time() - t_iter
            key, sub = jax.random.split(key)
            # Profiler window (reference §5.1: torch.profiler scopes ->
            # jax.profiler traces).
            if hc.profile_dir and it == hc.profile_steps[0]:
                jax.profiler.start_trace(hc.profile_dir)
            if hc.profile_dir and it == hc.profile_steps[1]:
                jax.profiler.stop_trace()
                log.info("profiler trace written to %s", hc.profile_dir)

            state, loss_dict = trainer.train_step(state, batch, sub, it)
            it += 1

            # TerminateOnNan (reference utils/base_trainer.py:261,317).
            if it % hc.log_every == 0 or hc.stop_on_nan_check_every == 1:
                loss_val = float(loss_dict.get("loss", 0.0))
                if not np.isfinite(loss_val):
                    ckpt.save(it, state, extra={
                        "render_sched": trainer.scheduler.state_dict()})
                    raise FloatingPointError(
                        f"non-finite loss {loss_val} at iteration {it}; "
                        "checkpoint saved")

            if it % hc.log_every == 0:
                loss_dict = {k: float(v) for k, v in loss_dict.items()}
                dt = time.time() - t_iter
                log.info("epoch %d it %d loss %.5f (t_iter %.3fs "
                         "t_data %.3fs) %s", epoch, it,
                         loss_dict.get("loss", float("nan")), dt, t_data,
                         {k: round(v, 5) for k, v in loss_dict.items()})
            t_iter = time.time()

            if on_iteration is not None:
                on_iteration(it, state, loss_dict)

            if it % hc.checkpoint_every == 0:
                ckpt.save(it, state, extra={
                    "render_sched": trainer.scheduler.state_dict()})

            def validate_now():
                nonlocal best_value
                metrics = run_validation(trainer, state, val_loader)
                log.info("validation @ %d: %s", it,
                         {k: round(v, 5) for k, v in metrics.items()})
                if on_validation is not None:
                    on_validation(it, metrics)
                if hc.save_best_metric and hc.save_best_metric in metrics:
                    val = metrics[hc.save_best_metric] * hc.save_best_sign
                    if best_value is None or val > best_value:
                        best_value = val
                        best_ckpt.save(it, state)
                        try:
                            with open(best_value_path, "w") as f:
                                json.dump({"metric": hc.save_best_metric,
                                           "signed_value": best_value,
                                           "value": metrics[
                                               hc.save_best_metric],
                                           "step": int(it)}, f)
                        except Exception:           # noqa: BLE001
                            pass
                        log.info("new best %s=%.5f @ %d",
                                 hc.save_best_metric,
                                 metrics[hc.save_best_metric], it)

            if (val_loader is not None and hc.eval_use_iters
                    and it % hc.validate_every == 0):
                validate_now()

            if (vis_loader is not None and visualize is not None
                    and it % hc.visualize_every == 0):
                visualize(trainer, state, vis_loader, it)

            if _stop_requested:
                return finish(state, "SIGTERM")
            if hc.stop_iteration and it >= hc.stop_iteration:
                return finish(state, "stop_iteration")

        # Epoch-end validation (reference eval_use_iters=False mode,
        # utils/base_trainer.py:98-110).
        if val_loader is not None and not hc.eval_use_iters:
            validate_now()

    return finish(state, "num_epochs reached")


def run_validation(trainer: BTSTrainer, state: TrainState,
                   val_loader) -> dict:
    """Metric pass over the validation set
    (reference utils/base_trainer.py:98-110 + metrics).

    On multi-host runs every host evaluates its own data shard; totals and
    counts are summed across hosts before the divide, so the reported means
    cover the full validation set (reference MeanMetric sync_all_reduce)."""
    metrics: dict[str, MeanMetric] = {}
    for batch in val_loader:
        batch = shard_batch(batch, trainer.mesh)
        out = trainer.eval_step(state, batch)
        if "metrics" in out:
            for k, v in out["metrics"].items():
                metrics.setdefault(k, MeanMetric()).update(float(v))
    return _cross_host_means(metrics)


_val_round = iter(range(1 << 62))  # same sequence on every host


def _cross_host_means(metrics: dict) -> dict:
    """Sum per-host (total, count) across hosts, then divide.

    The exchange rides the jax.distributed coordination-service KV store
    (the channel the cluster already depends on for startup/heartbeats)
    rather than a device collective: process_allgather spins up a
    host-level gloo context whose rendezvous window is ~30 s, and hosts
    legitimately skew past that (validation-loop length differences,
    stragglers, shared-core CI) — observed as `Gloo context initialization
    failed: DEADLINE_EXCEEDED` in the 2-process test. For a dozen host
    floats the KV store is the right transport; the get below waits
    minutes, not seconds."""
    if jax.process_count() == 1 or not metrics:
        return {k: m.compute() for k, m in metrics.items()}
    names = sorted(metrics)
    payload = json.dumps([[metrics[k].total, float(metrics[k].count)]
                          for k in names])
    rnd = next(_val_round)
    totals = np.zeros((len(names), 2), dtype=np.float64)
    try:
        from jax._src import distributed
        client = distributed.global_state.client
        assert client is not None
        client.key_value_set(f"bts/val/{rnd}/{jax.process_index()}", payload)
        for p in range(jax.process_count()):
            got = client.blocking_key_value_get(f"bts/val/{rnd}/{p}",
                                                300_000)  # ms
            totals += np.asarray(json.loads(got), dtype=np.float64)
    except (ImportError, AttributeError):
        # Fallback for jax versions without the internal client handle.
        from jax.experimental import multihost_utils
        local = np.asarray([[metrics[k].total, float(metrics[k].count)]
                            for k in names], dtype=np.float64)
        totals = np.asarray(
            multihost_utils.process_allgather(local)).sum(axis=0)
    return {k: (totals[i, 0] / totals[i, 1]) if totals[i, 1] else
            float("nan") for i, k in enumerate(names)}
