"""Roofline / MFU accounting for the headline workloads on the real chip.

For each workload, pairs the marginal-timed per-iteration cost (bench.py
methodology — fixed relay costs cancel) with the compiled executable's own
counted FLOPs and HBM bytes (XLA cost_analysis of the exact program being
timed), and relates both to the v5e peaks. This bounds claims like "the
gather envelope is the floor": a stage at 3% MXU and 80% HBM is
bandwidth-bound, full stop; a stage at 3% MXU and 5% HBM has headroom
somewhere else (dispatch, serialization, layout).

Workloads (the PERF.md/BENCH headliners):
  det_frame     full deterministic self-view depth frame (encode included)
  jit_frame     stratified-jitter frame, Pallas jitter kernel live on TPU
  general_query 245k-point cross-view query (NVS/training hot path)
  train_step    flagship KITTI train step (batch 8, 2048 rays x 64)

Peaks: TPU v5e = 197 TF/s bf16 MXU, 819 GB/s HBM (public spec). The f32
VPU peak is ~1/4 the bf16 MXU number; MFU below is vs the bf16 peak —
honest for this bf16-compute model.

Usage: python scripts/roofline.py [workload ...]   (default: all)
       Prints a table + one JSON line (consumed nowhere; PERF.md records
       the numbers).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from behindthescenes_tpu.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

PEAK_TFLOPS = 197e12          # v5e bf16 MXU
PEAK_HBM = 819e9              # v5e HBM GB/s
H, W = 192, 640
K = 64


def cost_of(jitted, *args):
    """(flops, bytes accessed) counted by XLA for the compiled program."""
    c = jitted.lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def marginal(fn_loop, args, lo, hi, reps=4):
    jf = jax.jit(fn_loop)
    lo_, hi_ = jnp.int32(lo), jnp.int32(hi)
    float(jf(*args, lo_))
    float(jf(*args, hi_))

    def t(n):
        t0 = time.perf_counter()
        float(jf(*args, n))
        return time.perf_counter() - t0

    ts = [(t(lo_), t(hi_)) for _ in range(reps)]
    return (float(np.median([b for _, b in ts]))
            - float(np.median([a for a, _ in ts]))) / (hi - lo)


def _flagship_inference_setup():
    from behindthescenes_tpu.models.bts import BTSNet
    model_conf = {
        "z_near": 3.0, "z_far": 80.0, "inv_z": True, "code_mode": "z",
        "learn_empty": False,
        "code": {"num_freqs": 6, "freq_factor": 1.5, "include_input": True},
        "encoder": {"type": "monodepth2", "resnet_layers": 50,
                    "num_ch_dec": [32, 32, 64, 128, 256], "d_out": 64,
                    "scales": [0]},
        "mlp_coarse": {"type": "resnet", "n_blocks": 0, "d_hidden": 64},
        "mlp_fine": {"type": "empty"},
    }
    net = BTSNet.from_conf(model_conf, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 2, H, W, 3)), jnp.float32)
    poses = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)) \
        .at[:, 1, 0, 3].set(0.54)
    projs = jnp.broadcast_to(jnp.asarray(
        [[0.6, 0, 0], [0, 1.8, 0], [0, 0, 1]], jnp.float32), (1, 2, 3, 3))
    variables = net.init(jax.random.PRNGKey(0), images, projs, poses,
                         jnp.zeros((1, 8, 3)))
    return net, variables, images, poses, projs


def frame_workload(deterministic: bool):
    from behindthescenes_tpu import renderer as renderer_lib
    from behindthescenes_tpu.inference import render_depth_selfview
    from behindthescenes_tpu.models.bts import BTSNet
    net, variables, images, poses, projs = _flagship_inference_setup()
    rcfg = renderer_lib.RendererConfig(n_coarse=K, n_fine=0, lindisp=True,
                                       hard_alpha_cap=True)

    def frame(variables, images, key):
        grid = net.apply(variables, images, projs, poses, ids_encoder=[0],
                         ids_render=[0, 1], method=BTSNet.encode)
        depth, _, _ = render_depth_selfview(
            net, variables, grid, key, H, W, rcfg, 3.0, 80.0,
            deterministic=deterministic)
        return depth

    def loop(variables, images, key, n):
        def body(i, acc):
            d = frame(variables, images + acc * 1e-9,
                      jax.random.fold_in(key, i))
            return acc + jnp.sum(d) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    single = jax.jit(frame)
    args = (variables, images, jax.random.PRNGKey(1))
    t = marginal(loop, args, 4, 34)
    fl, by = cost_of(single, *args)
    return t, fl, by, f"{H * W} rays"


def general_query_workload():
    from behindthescenes_tpu.models.bts import BTSNet
    net, variables, images, poses, projs = _flagship_inference_setup()
    grid = jax.jit(lambda v, im: net.apply(
        v, im, projs, poses, ids_encoder=[0], ids_render=[0, 1],
        method=BTSNet.encode))(variables, images)
    p = 245760
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (1, p, 3)) * np.array([8, 2, 1])
                      + np.array([0, 0, 12.0]), jnp.float32)

    def query(variables, grid, pts):
        rgb, inv, sig = net.apply(variables, grid, pts, method=BTSNet.query)
        return jnp.sum(sig) + jnp.sum(rgb)

    def loop(variables, grid, pts, n):
        def body(i, acc):
            return acc + query(variables, grid, pts + acc * 1e-12)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    args = (variables, grid, pts)
    t = marginal(loop, args, 5, 65)
    fl, by = cost_of(jax.jit(query), *args)
    return t, fl, by, f"{p} pts"


def train_step_workload():
    from bench_train import build_step
    step, state, batch, key, ids, train_enc, config, desc = build_step(
        8, "kitti_raw")

    def one(state, batch, key):
        st, _ = step(state, batch, key, ids, train_enc)
        return jnp.sum(st.params["mlp_coarse"]["lin_in"]["kernel"])

    def loop(state, batch, key, n):
        def body(i, carry):
            st, k = carry
            k, sub = jax.random.split(k)
            st, _ = step(st, batch, sub, ids, train_enc)
            return (st, k)
        st, _ = jax.lax.fori_loop(0, n, body, (state, key))
        return jnp.sum(st.params["mlp_coarse"]["lin_in"]["kernel"])

    args = (state, batch, key)
    t = marginal(loop, args, 3, 13)
    fl, by = cost_of(jax.jit(one), *args)
    return t, fl, by, "batch 8"


WORKLOADS = {
    "det_frame": lambda: frame_workload(True),
    "jit_frame": lambda: frame_workload(False),
    "general_query": general_query_workload,
    "train_step": train_step_workload,
}


def main():
    names = sys.argv[1:] or list(WORKLOADS)
    rows = {}
    print(f"{'workload':<15} {'ms':>8} {'GFLOP':>8} {'GB':>7} "
          f"{'TF/s':>7} {'%MXU':>6} {'GB/s':>7} {'%HBM':>6}")
    for name in names:
        t, fl, by, note = WORKLOADS[name]()
        tfs = fl / t / 1e12
        gbs = by / t / 1e9
        rows[name] = {
            "ms": round(t * 1e3, 3), "gflop": round(fl / 1e9, 2),
            "gb_moved": round(by / 1e9, 4),
            "achieved_tflops": round(tfs, 2),
            "mfu_pct": round(100 * fl / t / PEAK_TFLOPS, 2),
            "achieved_gbps": round(gbs, 1),
            "hbm_pct": round(100 * by / t / PEAK_HBM, 2),
            "note": note,
        }
        r = rows[name]
        print(f"{name:<15} {r['ms']:>8.3f} {r['gflop']:>8.2f} "
              f"{r['gb_moved']:>7.3f} {r['achieved_tflops']:>7.2f} "
              f"{r['mfu_pct']:>6.2f} {r['achieved_gbps']:>7.1f} "
              f"{r['hbm_pct']:>6.2f}")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
