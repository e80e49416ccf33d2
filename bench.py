"""Benchmark: full-frame depth render throughput on the flagship model.

Workload (BASELINE.md): KITTI eval_depth inner loop — encode one 192x640
frame with the ResNet-50 monodepth2 backbone, then volume-render every pixel
(122880 rays x 64 samples ≈ 7.9M field queries: project, bilinear-gather,
positional-encode, density MLP, color reprojection, alpha-composite).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: ratio against the reference PyTorch pipeline's measured
throughput for the same workload on this host's CPU (the only hardware both
stacks share here; the reference's published hardware was 1x A40 and no
throughput numbers exist in the repo — see BASELINE.md). The constant below
was measured with scripts/bench_torch_baseline.py on this machine.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

from behindthescenes_tpu.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

# Fallback rays/sec of the torch-CPU reference-equivalent hot path
# (scripts/bench_torch_baseline.py, median of 3, measured 2026-08 on this
# machine). main() re-measures the baseline live at bench time so the
# denominator carries its own provenance; this constant is only used when
# the live run fails, and the JSON says so.
TORCH_CPU_BASELINE_RAYS_PER_SEC = 23577.0

# Fallback samples/sec of the REFERENCE training step run live on this
# host's CPU (scripts/bench_torch_train_baseline.py — the actual
# /root/reference modules: encode + 2048-ray render + ReconstructionLoss
# backward + Adam at the flagship KITTI shape, batch 1, median of 3;
# measured 2026-08). Anchors `train_vs_baseline`; BASELINE.md's counted-op
# A40/A100 table gives the hardware-honest multiple.
TORCH_CPU_TRAIN_BASELINE_SAMPLES_PER_SEC = 0.345


def measure_torch_baseline():
    """Re-measure the vs_baseline denominator on THIS host, in a
    subprocess (torch's thread pools stay out of the TPU process).
    Returns (rays_per_sec, provenance_dict)."""
    import platform
    import re
    import subprocess
    import sys
    load1 = os.getloadavg()[0]
    ncpu = os.cpu_count() or 1
    host = {"node": platform.node(), "machine": platform.machine(),
            "date": time.strftime("%Y-%m-%d"),
            "loadavg1_before": round(load1, 2), "ncpu": ncpu}
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "scripts", "bench_torch_baseline.py")],
            capture_output=True, text=True, timeout=600,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        m = re.search(r"([0-9.]+) rays/s", out.stdout)
        if out.returncode == 0 and m:
            live = float(m.group(1))
            ratio = live / TORCH_CPU_BASELINE_RAYS_PER_SEC
            if ratio < 1 / 2 or ratio > 2:
                # The torch baseline is CPU-bound; a contended host (e.g.
                # a test suite running alongside) silently deflates it and
                # inflates vs_baseline. A >2x swing vs the stored constant
                # on the same workload means the measurement is suspect —
                # keep the constant and record both. (If the host has
                # legitimately changed by >2x, re-measure the constant with
                # scripts/bench_torch_baseline.py and update it.)
                return TORCH_CPU_BASELINE_RAYS_PER_SEC, {
                    **host, "live_rays_per_sec_rejected": round(live, 1),
                    "method": "stored constant (live re-measure deviated "
                    f"{ratio:.2f}x from the 2026-08 constant — host "
                    "contention suspected); scripts/bench_torch_baseline.py"}
            prov = {
                **host, "method": "scripts/bench_torch_baseline.py, "
                "measured live this run (median of 3 frames, torch CPU)"}
            if ratio < 1 / 1.3 or ratio > 1.3:
                # Accepted, but flag the drift so a slow creep (or mild
                # contention) is visible in the JSON record.
                prov["warning"] = (f"live baseline deviates {ratio:.2f}x "
                                   "from the stored 2026-08 constant")
            return live, prov
    except Exception:                               # noqa: BLE001
        pass
    return TORCH_CPU_BASELINE_RAYS_PER_SEC, {
        **host, "method": "STALE constant (live re-measure failed); "
        "scripts/bench_torch_baseline.py, 2026-08"}


def measure_torch_train_baseline():
    """Live re-measure of the reference TRAIN-step denominator (the actual
    /root/reference modules on this host's CPU, subprocess). Returns
    (samples_per_sec, provenance_dict); same contention guard as the
    render baseline."""
    import re
    import subprocess
    import sys
    stored = TORCH_CPU_TRAIN_BASELINE_SAMPLES_PER_SEC
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "scripts", "bench_torch_train_baseline.py"), "1", "3"],
            capture_output=True, text=True, timeout=900,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        m = re.search(r"([0-9.]+) samples/s", out.stdout)
        if out.returncode == 0 and m:
            live = float(m.group(1))
            ratio = live / stored
            if ratio < 1 / 2 or ratio > 2:
                return stored, {
                    "live_samples_per_sec_rejected": round(live, 4),
                    "method": "stored constant (live re-measure deviated "
                    f"{ratio:.2f}x — host contention suspected); "
                    "scripts/bench_torch_train_baseline.py"}
            prov = {"method": "scripts/bench_torch_train_baseline.py, "
                    "measured live this run (reference modules, torch CPU, "
                    "batch 1, median of 3 steps)"}
            if ratio < 1 / 1.3 or ratio > 1.3:
                prov["warning"] = (f"live train baseline deviates "
                                   f"{ratio:.2f}x from the stored constant")
            return live, prov
    except Exception:                               # noqa: BLE001
        pass
    return stored, {"method": "STALE constant (live re-measure failed); "
                    "scripts/bench_torch_train_baseline.py, 2026-08"}

H, W = 192, 640
N_COARSE = 64

FLAGSHIP_MODEL_CONF = {
    "z_near": 3.0, "z_far": 80.0, "inv_z": True, "code_mode": "z",
    "learn_empty": False,
    "code": {"num_freqs": 6, "freq_factor": 1.5, "include_input": True},
    "encoder": {"type": "monodepth2", "resnet_layers": 50,
                "num_ch_dec": [32, 32, 64, 128, 256], "d_out": 64,
                "scales": [0]},
    "mlp_coarse": {"type": "resnet", "n_blocks": 0, "d_hidden": 64},
    "mlp_fine": {"type": "empty"},
}


def flagship_setup():
    """The flagship inference workload's (net, variables, images, poses,
    projs). Single source of truth for every headline bench
    (scripts/roofline.py imports this so its MFU numbers describe the
    same program the headline times)."""
    from behindthescenes_tpu.models.bts import BTSNet
    net = BTSNet.from_conf(FLAGSHIP_MODEL_CONF, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 2, H, W, 3)),
                         dtype=jnp.float32)
    poses = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4))
    poses = poses.at[:, 1, 0, 3].set(0.54)  # stereo baseline
    projs = jnp.broadcast_to(jnp.asarray(
        [[0.6, 0, 0], [0, 1.8, 0], [0, 0, 1]], dtype=jnp.float32),
        (1, 2, 3, 3))
    variables = net.init(jax.random.PRNGKey(0), images, projs, poses,
                         jnp.zeros((1, 8, 3)))
    return net, variables, images, poses, projs


def build(deterministic: bool):
    from behindthescenes_tpu import renderer as renderer_lib

    net, variables, images, poses, projs = flagship_setup()
    rcfg = renderer_lib.RendererConfig(
        n_coarse=N_COARSE, n_fine=0, lindisp=True, hard_alpha_cap=True)

    from behindthescenes_tpu.inference import render_depth_selfview

    # deterministic=True: camera-z midpoint sampling, this framework's
    # production inference mode (same K samples/ray, shared z-code table,
    # no sampling noise). deterministic=False: reference-style stratified-
    # jitter sampling (nerf.py:103-123 semantics) — main() measures BOTH.

    def render_frame(variables, images, projs, poses, key):
        from behindthescenes_tpu.models.bts import BTSNet as _B
        grid = net.apply(variables, images, projs, poses, ids_encoder=[0],
                         ids_render=[0, 1], method=_B.encode)
        depth, weights, _ = render_depth_selfview(
            net, variables, grid, key, H, W, rcfg, 3.0, 80.0,
            deterministic=deterministic)
        return depth

    def render_n(variables, images, projs, poses, key, n):
        # n frames inside ONE compiled program (traced bound -> one
        # compile serves both loop counts). Each iteration re-encodes a
        # fresh image and re-renders.
        def body(i, acc):
            k = jax.random.fold_in(key, i)
            d = render_frame(variables, images + acc * 1e-9, projs, poses, k)
            return acc + jnp.sum(d) * 1e-12
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    fn = jax.jit(render_n)
    single = jax.jit(lambda v, im, pr, po, k: jnp.sum(
        render_frame(v, im, pr, po, k)))
    return fn, (variables, images, projs, poses, jax.random.PRNGKey(1)), \
        single


def bench_general_query():
    """Second metric (round-2): the GENERAL cross-view query that powers NVS
    rendering and training — project into encoder+render views, packed
    bilinear gathers, positional code, density MLP, color reprojection.
    Measured in field-queries (points) per second at 245k points."""
    from behindthescenes_tpu.models.bts import BTSNet

    net, variables, images, poses, projs = flagship_setup()
    grid = jax.jit(lambda v, im: net.apply(
        v, im, projs, poses, ids_encoder=[0], ids_render=[0, 1],
        method=BTSNet.encode))(variables, images)

    p = 245760
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-1, 1, (1, p, 3)) * np.array([8, 2, 1])
                      + np.array([0, 0, 12.0]), dtype=jnp.float32)

    def looped(v, g, x, n):
        def body(i, acc):
            rgb, inv, sig = net.apply(v, g, x + acc * 1e-12,
                                      method=BTSNet.query)
            return acc + jnp.sum(sig) + jnp.sum(rgb)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t_iter = marginal_time(jax.jit(looped), (variables, grid, pts), 5, 65)
    return p / t_iter


def marginal_time(jf, args, n_lo, n_hi, reps=6):
    """Per-iteration device time via the difference of two loop counts.

    The host<->device relay here adds ~28ms per dispatch+sync plus other
    fixed per-call costs (varying by +-10ms between calls); timing one loop
    count folds that into every iteration (at 10 iters it inflates per-iter
    time by ~3ms). The (T(hi) - T(lo)) / (hi - lo) marginal cancels every
    fixed cost; the hi-lo gap must be large vs the relay jitter. lo/hi
    calls are interleaved so slow drift cancels too. The loop bound is a
    traced argument so one compile serves both counts.
    """
    lo = jnp.int32(n_lo)
    hi = jnp.int32(n_hi)
    float(jf(*args, lo))          # warmup/compile
    float(jf(*args, hi))

    def t(n):
        t0 = time.perf_counter()
        _ = float(jf(*args, n))   # one sync per call
        return time.perf_counter() - t0

    ts = [(t(lo), t(hi)) for _ in range(reps)]
    t_lo = float(np.median([a for a, _ in ts]))
    t_hi = float(np.median([b for _, b in ts]))
    return (t_hi - t_lo) / (n_hi - n_lo)


def bench_train_step():
    """Third metric: flagship training-step throughput (guarded — a
    failure here must not break the primary JSON line)."""
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from bench_train import measure
    ms, sps, desc = measure(8, "kitti_raw")
    return sps, desc


def bench_nvs_frames():
    """NVS serving frame times (full 192x640 novel-view render from a
    one-frame encoding): the shipped general-path serving profile (24+16
    `fine_reuse_coarse`, configs/eval_synthetic_flagship_nvs.yaml) and the
    sweep-mode path (models/sweep.py, warp-lattice dense fetch + top-M
    colors) — the cross-round record of the repo's NVS serving speed."""
    from behindthescenes_tpu import renderer as renderer_lib
    from behindthescenes_tpu.models.bts import BTSNet
    from behindthescenes_tpu.models.sweep import render_frame_sweep
    from behindthescenes_tpu.ray_sampler import ImageRaySampler

    net, variables, images, poses, projs = flagship_setup()
    grid = jax.jit(lambda v, im: net.apply(
        v, im, projs, poses, ids_encoder=[0], ids_render=[0],
        method=BTSNet.encode))(variables, images)
    novel = jnp.eye(4).at[0, 3].set(0.25).at[1, 3].set(-0.05)
    out = {}

    # General path at the shipped serving profile (40 queried pts/ray).
    cfg_fast = renderer_lib.RendererConfig(
        n_coarse=24, n_fine=16, fine_reuse_coarse=True, lindisp=True,
        hard_alpha_cap=True)
    sampler = ImageRaySampler(3.0, 80.0, height=H, width=W)
    rays, _ = sampler.sample(None, None, novel[None, None], projs[:, :1])

    def gen_frame(v, g, rays, key, n):
        def body(i, acc):
            k = jax.random.fold_in(key, i)

            def query_fn(xyz, coarse):
                return net.apply(v, g, xyz + acc * 1e-12, coarse=coarse,
                                 method=BTSNet.query)

            o = renderer_lib.render_rays_chunked(
                query_fn, rays, k, cfg_fast, ray_chunk=61440)
            c = o.get("fine", o["coarse"])
            return (acc + jnp.sum(c["rgb"].astype(jnp.float32))
                    + jnp.sum(c["depth"]))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t = marginal_time(jax.jit(gen_frame),
                      (variables, grid, rays, jax.random.PRNGKey(1)), 2, 10)
    out["nvs_frame_ms_general_24p16_reuse"] = round(t * 1e3, 2)

    # Sweep mode (deterministic ladder, K=64).
    cfg64 = renderer_lib.RendererConfig(n_coarse=N_COARSE, lindisp=True,
                                        hard_alpha_cap=True)

    def make_sweep_frame(warp_scale):
        def sweep_frame(v, g, pose, n):
            def body(i, acc):
                o = render_frame_sweep(
                    net, v, g, pose.at[0, 3].add(acc * 1e-12), projs[0, 0],
                    (H, W), cfg64, warp_scale=warp_scale, mlp_at_warp=True,
                    color_mode="topm")
                c = o["coarse"]
                return (acc + jnp.sum(c["rgb"].astype(jnp.float32))
                        + jnp.sum(c["depth"]))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return sweep_frame

    # warp 0.5 is the shipped sweep default (PERF.md finding 19: the
    # scale-0 feature map is at render resolution, so warp 1.0 is an
    # identity lattice with no gather reduction); 0.25 is the
    # speed-of-light point, accuracy-checked on both converged families.
    t2 = marginal_time(jax.jit(make_sweep_frame(0.5)),
                       (variables, grid, novel), 2, 12)
    out["nvs_frame_ms_sweep_64"] = round(t2 * 1e3, 2)
    t3 = marginal_time(jax.jit(make_sweep_frame(0.25)),
                       (variables, grid, novel), 2, 12)
    out["nvs_frame_ms_sweep_64_w025"] = round(t3 * 1e3, 2)
    out["nvs_frame_unit"] = ("ms per full 192x640 novel-view frame, 1 chip "
                             "(general = shipped 24+16 fine_reuse profile; "
                             "sweep = models/sweep.py K=64 deterministic, "
                             "warp 0.5 default / 0.25 fast)")
    return out


def roofline_of(single_jit, args, t_seconds, extra_cost=(0.0, 0.0)):
    """MFU / HBM utilization of the timed program: XLA's own counted FLOPs
    and bytes for the compiled single-frame fn vs the v5e peaks (197 TF/s
    bf16 MXU, 819 GB/s HBM — scripts/roofline.py has the per-workload
    breakdown). extra_cost adds (flops, bytes) XLA cannot see — pallas
    custom-calls score ZERO in cost_analysis, so programs that dispatch a
    kernel pass its analytic cost (jitter_density.kernel_cost). Guarded:
    cost_analysis availability varies by backend."""
    try:
        c = single_jit.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        fl = float(c.get("flops", 0.0)) + extra_cost[0]
        by = float(c.get("bytes accessed", 0.0)) + extra_cost[1]
        if fl <= 0 or t_seconds <= 0:
            return None
        return {"mfu_pct": round(100 * fl / t_seconds / 197e12, 2),
                "hbm_pct": round(100 * by / t_seconds / 819e9, 2),
                "gflop": round(fl / 1e9, 2), "gb_moved": round(by / 1e9, 3)}
    except Exception:                               # noqa: BLE001
        return None


def main():
    fn, args, single = build(deterministic=True)
    t_frame = marginal_time(fn, args, 4, 34)
    rays_per_sec = H * W / t_frame
    det_roofline = roofline_of(single, args[:5], t_frame)
    fn = args = single = None  # release HBM before the next bench

    # Reference-semantics co-headline: stratified-jitter z sampling
    # (reference nerf.py:103-123) through the same pipeline, so the
    # headline is comparable to the reference's sampling at a glance.
    fn, args, single = build(deterministic=False)
    t_jit = marginal_time(fn, args, 4, 34)
    jittered_rays_per_sec = H * W / t_jit
    from behindthescenes_tpu.ops.pallas.jitter_density import (
        jitter_kernel_enabled, kernel_cost)
    kc = kernel_cost(H * W, N_COARSE, 64, 6) \
        if jitter_kernel_enabled() else (0.0, 0.0)
    jit_roofline = roofline_of(single, args[:5], t_jit, extra_cost=kc)
    fn = args = single = None

    nvs_pts_per_sec = bench_general_query()

    baseline_rps, baseline_prov = measure_torch_baseline()

    extra = {
        "jittered_rays_per_sec": round(jittered_rays_per_sec, 1),
        "jittered_unit": "rays/s, stratified-jitter sampling "
                         "(reference nerf.py semantics), 1 chip",
        "nvs_general_query_pts_per_sec": round(nvs_pts_per_sec, 1),
        "nvs_general_query_unit":
            "field queries/s, cross-view path (NVS/training), 1 chip",
        "baseline_rays_per_sec": round(baseline_rps, 1),
        "baseline_provenance": baseline_prov,
    }
    if det_roofline or jit_roofline:
        mfu = {"peaks": "v5e 197 TF/s bf16, 819 GB/s HBM"}
        if det_roofline:
            mfu["deterministic_frame"] = det_roofline
        if jit_roofline:
            mfu["jittered_frame"] = jit_roofline
        extra["mfu"] = mfu
    try:
        sps, desc = bench_train_step()
        extra["train_samples_per_sec"] = round(sps, 1)
        extra["train_unit"] = f"training samples/s ({desc}), 1 chip"
        train_base, train_prov = measure_torch_train_baseline()
        extra["train_vs_baseline"] = round(sps / train_base, 1)
        extra["train_baseline_samples_per_sec"] = round(train_base, 4)
        extra["train_baseline_provenance"] = train_prov
    except Exception as e:                      # noqa: BLE001
        extra["train_samples_per_sec_error"] = repr(e)[:200]

    # The recommended FAST training profile (24+16 fine_reuse_coarse, 40
    # queried pts/ray — PERF.md training table) and the best-NVS serving
    # frame, so round BENCH records carry the repo's headline
    # configurations, not just the reference-shaped defaults.
    try:
        import sys as _sys
        _sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from bench_train import measure as _tmeasure
        _, fast_sps, fast_desc = _tmeasure(8, "kitti_raw_fast")
        extra["train_fast_samples_per_sec"] = round(fast_sps, 1)
        extra["train_fast_unit"] = f"training samples/s ({fast_desc}), 1 chip"
    except Exception as e:                      # noqa: BLE001
        extra["train_fast_samples_per_sec_error"] = repr(e)[:200]

    # Tile-region dense fetch applied to the SAME 64-flat step (exact
    # within-region bilinear, full sampling semantics — PERF.md finding
    # 18; opt-in via model_conf.tile_fetch_region).
    try:
        from bench_train import measure as _tmeasure2
        _, tiles_sps, tiles_desc = _tmeasure2(8, "kitti_raw_tiles")
        extra["train_tiles_samples_per_sec"] = round(tiles_sps, 1)
        extra["train_tiles_unit"] = (f"training samples/s ({tiles_desc}, "
                                     "tile_fetch_region 16x64), 1 chip")
    except Exception as e:                      # noqa: BLE001
        extra["train_tiles_samples_per_sec_error"] = repr(e)[:200]

    try:
        nvs = bench_nvs_frames()
        extra.update(nvs)
    except Exception as e:                      # noqa: BLE001
        extra["nvs_frame_error"] = repr(e)[:200]

    print(json.dumps({
        "metric": "depth_render_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s (192x640x64smp full pipeline, 1 chip)",
        "vs_baseline": round(rays_per_sec / baseline_rps, 2),
        "extra_metrics": extra,
    }))


if __name__ == "__main__":
    main()
