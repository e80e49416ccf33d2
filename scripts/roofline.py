"""Roofline / MFU accounting for the headline workloads on the real chip.

For each workload, pairs the marginal-timed per-iteration cost (bench.py
methodology — fixed relay costs cancel) with the compiled executable's own
counted FLOPs and HBM bytes (XLA cost_analysis of the exact program being
timed), and relates both to the v5e peaks. This bounds claims like "the
gather envelope is the floor": a stage at 3% MXU and 80% HBM is
bandwidth-bound, full stop; a stage at 3% MXU and 5% HBM has headroom
somewhere else (dispatch, serialization, layout).

Counting caveats (both corrected here):
- pallas custom-calls score ZERO in cost_analysis — the jittered frame
  adds the kernel's analytic cost (jitter_density.kernel_cost).
- cost analysis runs on a single-shot program whose outputs must keep the
  WHOLE computation live: the train-step probe reduces over every leaf of
  the returned state (a single-leaf reduce lets XLA DCE the other
  parameter updates and most of the backward pass — the CLAUDE.md
  "force full reduces" trap at pytree level).

Workloads (the PERF.md/BENCH headliners — model/inputs are imported from
bench.py so these numbers describe the exact programs the headlines time):
  det_frame     full deterministic self-view depth frame (encode included)
  jit_frame     stratified-jitter frame, Pallas jitter kernel live on TPU
  general_query 245k-point cross-view query (NVS/training hot path)
  train_step    flagship KITTI train step (batch 8, 2048 rays x 64)

Peaks: TPU v5e = 197 TF/s bf16 MXU, 819 GB/s HBM (public spec).

Usage: python scripts/roofline.py [workload ...]   (default: all)
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from behindthescenes_tpu.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from bench import H, W, N_COARSE, flagship_setup, marginal_time

PEAK_TFLOPS = 197e12          # v5e bf16 MXU
PEAK_HBM = 819e9              # v5e HBM GB/s


def cost_of(jitted, *args, extra=(0.0, 0.0)):
    """(flops, bytes accessed) counted by XLA for the compiled program,
    plus `extra` analytic (flops, bytes) XLA cannot see (pallas calls)."""
    c = jitted.lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return (float(c.get("flops", 0.0)) + extra[0],
            float(c.get("bytes accessed", 0.0)) + extra[1])


def frame_workload(deterministic: bool):
    from behindthescenes_tpu import renderer as renderer_lib
    from behindthescenes_tpu.inference import render_depth_selfview
    from behindthescenes_tpu.models.bts import BTSNet
    from behindthescenes_tpu.ops.pallas.jitter_density import (
        jitter_kernel_enabled, kernel_cost)
    net, variables, images, poses, projs = flagship_setup()
    rcfg = renderer_lib.RendererConfig(n_coarse=N_COARSE, n_fine=0,
                                       lindisp=True, hard_alpha_cap=True)

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

    args = (variables, images, jax.random.PRNGKey(1))
    t = marginal_time(jax.jit(loop), args, 4, 34)
    extra = (0.0, 0.0)
    if not deterministic and jitter_kernel_enabled():
        extra = kernel_cost(H * W, N_COARSE, 64, 6)
    fl, by = cost_of(jax.jit(frame), *args, extra=extra)
    return t, fl, by, f"{H * W} rays"


def general_query_workload():
    from behindthescenes_tpu.models.bts import BTSNet
    net, variables, images, poses, projs = flagship_setup()
    grid = jax.jit(lambda v, im: net.apply(
        v, im, projs, poses, ids_encoder=[0], ids_render=[0, 1],
        method=BTSNet.encode))(variables, images)
    p = 245760
    rng = np.random.default_rng(1)
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
    t = marginal_time(jax.jit(loop), args, 5, 65)
    fl, by = cost_of(jax.jit(query), *args)
    return t, fl, by, f"{p} pts"


def train_step_workload():
    from bench_train import build_step
    step, state, batch, key, ids, train_enc, config, desc = build_step(
        8, "kitti_raw")

    def _all_leaves_sum(tree):
        # EVERY leaf stays live so cost analysis keeps the full backward
        # pass + optimizer update (single-leaf reads get DCE'd).
        return sum(jnp.sum(leaf.astype(jnp.float32))
                   for leaf in jax.tree_util.tree_leaves(tree))

    def one(state, batch, key):
        st, _ = step(state, batch, key, ids, train_enc)
        return (_all_leaves_sum(st.params)
                + _all_leaves_sum(st.opt_state)
                + _all_leaves_sum(st.batch_stats))

    def loop(state, batch, key, n):
        def body(i, carry):
            st, k = carry
            k, sub = jax.random.split(k)
            st, _ = step(st, batch, sub, ids, train_enc)
            return (st, k)
        st, _ = jax.lax.fori_loop(0, n, body, (state, key))
        return jnp.sum(st.params["mlp_coarse"]["lin_in"]["kernel"])

    args = (state, batch, key)
    t = marginal_time(jax.jit(loop), args, 3, 13)
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
              f"{r['hbm_pct']:>6.2f}", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
