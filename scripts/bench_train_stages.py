"""Cumulative stage split of the flagship train step (fwd+bwd, on chip).

Each probe marginal-times a PREFIX of the training pipeline (encode →
render → loss → adam) under jax.grad; consecutive differences give the
per-stage fwd+bwd cost. Every probe perturbs the params by the carried
accumulator (identical cost in all probes, cancels in differences) so
nothing hoists out of the timing loop (PERF.md "measurement methodology").

Usage: python scripts/bench_train_stages.py [micro_batch]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from behindthescenes_tpu.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from behindthescenes_tpu.datasets.synthetic import SyntheticBoxDataset, \
    collate
from behindthescenes_tpu.models.bts import BTSNet
from behindthescenes_tpu.parallel.mesh import make_mesh
from behindthescenes_tpu.training.trainer import BTSTrainer

H, W = 192, 640
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_VIEWS = 4


def main():
    config = {
        "seed": 0, "learning_rate": 1e-4, "bf16": True,
        "model_conf": {
            "arch": "BTSNet", "z_near": 3.0, "z_far": 80.0, "inv_z": True,
            "learn_empty": False, "code_mode": "z",
            "encoder": {"type": "monodepth2", "resnet_layers": 50,
                        "num_ch_dec": (32, 32, 64, 128, 256), "d_out": 64,
                        "scales": (0,)},
            "code": {"num_freqs": 6, "freq_factor": 1.5,
                     "include_input": True},
            "mlp_coarse": {"type": "resnet", "n_blocks": 0, "d_hidden": 64},
            "mlp_fine": {"type": "empty"},
            "n_frames_render": 2, "frame_sample_mode": "default",
            "sample_mode": "patch", "patch_size": 8,
            "ray_batch_size": 2048,
            "prediction_mode": "default", "flip_augmentation": False,
        },
        "loss": {"criterion": "l1+ssim", "invalid_policy": "weight_guided",
                 "lambda_edge_aware_smoothness": 0.001},
        "renderer": {"n_coarse": 64, "lindisp": True,
                     "hard_alpha_cap": True},
        "scheduler": {"type": "fix"},
    }
    ds = SyntheticBoxDataset(length=BATCH, frame_count=N_VIEWS, height=H,
                             width=W, return_depth=False)
    batch = collate([ds[i] for i in range(BATCH)])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    trainer = BTSTrainer(config, mesh=make_mesh(jax.devices()[:1]))
    key = jax.random.PRNGKey(0)
    state = trainer.init_state(batch, key)
    ids = trainer.wrapper.select_views(np.random.default_rng(0), N_VIEWS,
                                       training=True)
    cfg = trainer.scheduler.step()
    wrapper = trainer.wrapper
    criterion = trainer.criterion
    net = trainer.net
    tx = trainer.tx

    def perturb(params, acc):
        return jax.tree_util.tree_map(lambda p: p + acc * 1e-20, params)

    def variables_of(params):
        v = {"params": params}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        return v

    def encode_loss(params, k):
        grid, _ = net.apply(variables_of(params), batch["imgs"],
                            batch["projs"], batch["poses"],
                            method=BTSNet.encode, mutable=["batch_stats"],
                            ids_encoder=ids.ids_encoder,
                            ids_render=ids.ids_render,
                            combine_ids=ids.combine_ids,
                            combine_encoder=ids.combine_encoder,
                            combine_render=ids.combine_render,
                            train=True)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in grid.features)

    def render_loss(params, k):
        data, _ = wrapper.forward(variables_of(params), batch, k, ids,
                                  train=True, renderer_cfg=cfg)
        c = data["coarse"][0]
        return (jnp.sum(c["rgb"].astype(jnp.float32))
                + jnp.sum(c["depth"]) + jnp.sum(c["weights"]))

    def full_loss(params, k):
        data, _ = wrapper.forward(variables_of(params), batch, k, ids,
                                  train=True, renderer_cfg=cfg)
        loss, _ = criterion(data)
        return loss

    def tree_total(t):
        # Consume EVERY leaf: reducing to one leaf lets XLA dead-code the
        # rest of the backward pass (the F/P2 gap showed exactly that).
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(t))

    def probe_grad(loss_fn):
        def run(params, key, n):
            def body(i, carry):
                acc, k = carry
                k, sub = jax.random.split(k)
                g = jax.grad(loss_fn)(perturb(params, acc), sub)
                return (acc + tree_total(g) * 1e-12, k)
            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), key))
            return acc
        return run

    def probe_fwd(loss_fn):
        def run(params, key, n):
            def body(i, carry):
                acc, k = carry
                k, sub = jax.random.split(k)
                val = loss_fn(perturb(params, acc), sub)
                return (acc + val * 1e-12, k)
            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), key))
            return acc
        return run

    def probe_adam(params, key, n):
        opt_state = tx.init(params)
        def body(i, carry):
            acc, k, opt = carry
            k, sub = jax.random.split(k)
            g = jax.grad(full_loss)(perturb(params, acc), sub)
            updates, opt = tx.update(g, opt, params)
            return (acc + tree_total(updates) * 1e-12, k, opt)
        acc, _, _ = jax.lax.fori_loop(0, n, body,
                                      (jnp.float32(0.0), key, opt_state))
        return acc

    def probe_noop(params, key, n):
        def body(i, carry):
            acc, k = carry
            p = perturb(params, acc)
            return (acc + jnp.sum(
                p["mlp_coarse"]["lin_in"]["kernel"]) * 1e-12, k)
        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0.0), key))
        return acc

    grid_static = jax.jit(lambda p: net.apply(
        {"params": p, **({"batch_stats": state.batch_stats}
                         if state.batch_stats else {})},
        batch["imgs"], batch["projs"], batch["poses"],
        method=BTSNet.encode, ids_encoder=ids.ids_encoder,
        ids_render=ids.ids_render, combine_ids=ids.combine_ids,
        combine_encoder=ids.combine_encoder,
        combine_render=ids.combine_render, train=False))(state.params)
    npts = 2048 * 64
    xyz0 = jnp.asarray(
        np.random.default_rng(1).normal(size=(BATCH, npts, 3)) * 8
        + np.array([0, 0, 10.0]), jnp.float32)

    # Grid passed as an argument, NOT a closure: closed-over device
    # arrays embed as program constants (126MB HLO -> relay HTTP 413).
    @jax.jit
    def _query_run(params_, grid_, key_, n_):
        def body(i, carry):
            acc, k = carry
            rgb, inv, sig = net.apply(
                {"params": params_,
                 **({"batch_stats": state.batch_stats}
                    if state.batch_stats else {})},
                grid_, xyz0 + acc * 1e-18, method=BTSNet.query)
            return (acc + jnp.sum(rgb.astype(jnp.float32)) * 1e-12
                    + jnp.sum(sig) * 1e-12 + jnp.sum(inv) * 1e-12, k)
        acc, _ = jax.lax.fori_loop(0, n_, body, (jnp.float32(0.0), key_))
        return acc

    def probe_query(params, key, n):
        return _query_run(params, grid_static, key, n)

    probe_query.prejitted = True

    probes = [
        ("P0 perturb only (loop overhead)", probe_noop),
        ("Q  raw query fwd (8x131k pts)", probe_query),
        ("F1 encode fwd", probe_fwd(encode_loss)),
        ("F2 encode+render fwd", probe_fwd(render_loss)),
        ("F3 + loss fwd", probe_fwd(full_loss)),
        ("P1 encode fwd+bwd", probe_grad(encode_loss)),
        ("P2 encode+render fwd+bwd", probe_grad(render_loss)),
        ("P3 + loss fwd+bwd", probe_grad(full_loss)),
        ("P4 + adam (full step)", probe_adam),
    ]

    lo, hi = jnp.int32(3), jnp.int32(13)
    for name, fn in probes:
        # probe_query manages its own jit (grid must be an ARGUMENT: jitting
        # the wrapper would re-capture it as a 126MB program constant).
        jf = fn if getattr(fn, "prejitted", False) else jax.jit(fn)
        float(jf(state.params, key, lo))
        float(jf(state.params, key, hi))
        def t(n):
            t0 = time.perf_counter()
            float(jf(state.params, key, n))
            return time.perf_counter() - t0
        ts = [(t(lo), t(hi)) for _ in range(3)]
        ms = (np.median([b for _, b in ts]) - np.median([a for a, _ in ts])) \
            / (int(hi) - int(lo)) * 1e3
        print(f"{name:34s}: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
