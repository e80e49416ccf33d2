"""Real multi-host execution: 2 local `jax.distributed` processes on CPU.

Everything multi-host in the codebase is exercised by actually running it
(not by reading): `platform.maybe_init_distributed` (coordinator env vars),
per-host dataset shards (`loader.shard_for_host` via train.py's host_shard
wiring), global-batch assembly (`mesh.shard_batch`'s
make_array_from_process_local_data path), the SPMD train step over a
cross-process mesh, the process_allgather validation reduction
(`harness._cross_host_means`), and multi-host orbax checkpointing.

The consistency assertion is the SPMD contract: both hosts compute the
same global program, so their logged losses and validation metrics must be
IDENTICAL (they are the same replicated arrays) — a host-varying traced
input (forked seed, diverged view ids) breaks bit-equality immediately.
"""
import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training(tmp_path):
    port = _free_port()
    out = tmp_path / "run"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            # one CPU device per process -> a 2-device cross-process mesh
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "train.py", "-cn", "exp_synthetic",
             f"output_path={out}", "stop_iteration=22", "validate_every=20",
             "checkpoint_every=20", "log_every_iters=5", "num_epochs=1000",
             "data.length=16", "tensorboard=false", "num_workers=0"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    logs = []
    for pid, p in enumerate(procs):
        try:
            stdout, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
        assert p.returncode == 0, \
            f"process {pid} failed (rc={p.returncode}):\n{stdout[-4000:]}"

    for pid, text in enumerate(logs):
        assert f"multi-host: process {pid}/2" in text, text[-2000:]

    # SPMD consistency: per-iteration losses and validation metrics are
    # replicated global values — bit-identical across hosts.
    def extract(pattern, text):
        vals = re.findall(pattern, text)
        assert vals, f"no match for {pattern!r} in:\n{text[-3000:]}"
        return vals

    loss_re = r"it (\d+) loss ([0-9.\-nan]+)"
    losses = [extract(loss_re, t) for t in logs]
    assert losses[0] == losses[1], (losses[0], losses[1])
    assert len(losses[0]) >= 4                     # it 5,10,15,20

    val_re = r"validation @ (\d+): (\{[^}]*\})"
    vals = [extract(val_re, t) for t in logs]
    assert vals[0] == vals[1], (vals[0], vals[1])
    assert "abs_rel" in vals[0][0][1]

    # Multi-host orbax checkpoints landed (step 20 periodic + 22 final).
    steps = {int(d) for d in os.listdir(out / "checkpoints")
             if d.isdigit()}
    assert {20, 22} <= steps, steps


def test_shard_for_host_partitions_disjointly():
    """Host shards are disjoint and cover the dataset (DistributedSampler
    semantics, without the padding)."""
    from behindthescenes_tpu.datasets.loader import shard_for_host

    class DS:
        def __len__(self):
            return 17

        def __getitem__(self, i):
            return i

    shards = [shard_for_host(DS(), h, 2) for h in range(2)]
    seen = [s[i] for s in shards for i in range(len(s))]
    assert len(seen) == len(set(seen)) == 16          # disjoint, 17//2*2
    assert all(len(s) == 8 for s in shards)
