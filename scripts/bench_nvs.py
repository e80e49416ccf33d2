"""End-to-end novel-view-synthesis frame benchmark (general path).

Measures the honest wall time of one full NVS frame on the flagship model:
encode a 192x640 stereo pair once, then volume-render a NOVEL camera pose
(122880 rays x 64 samples) through the general cross-view query path
(project into encoder + render views, packed bilinear gathers, positional
code, density MLP, color reprojection, alpha composite) with
`render_rays_chunked`. This is the workload PERF.md finding 4 only
estimated from the 245k-point query microbench (~140 ms of query time);
this script times the whole frame including compositing and chunk
orchestration. Marginal timing per bench.py (relay fixed costs cancel).

Usage: python scripts/bench_nvs.py [ray_chunk ...]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from behindthescenes_tpu.platform import apply_platform_env

apply_platform_env()

import jax
import jax.numpy as jnp

from bench import H, W, N_COARSE, marginal_time  # flagship shapes


def main(ray_chunks, n_coarse=None, n_fine=0, reuse=False):
    from behindthescenes_tpu.models.bts import BTSNet
    from behindthescenes_tpu import renderer as renderer_lib
    from behindthescenes_tpu.ray_sampler import ImageRaySampler

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
    rcfg = renderer_lib.RendererConfig(
        n_coarse=n_coarse or N_COARSE, n_fine=n_fine, lindisp=True,
        hard_alpha_cap=True, fine_reuse_coarse=reuse)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (1, 2, H, W, 3)),
                         dtype=jnp.float32)
    poses = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)).at[:, 1, 0, 3].set(0.54)
    projs = jnp.broadcast_to(jnp.asarray(
        [[0.6, 0, 0], [0, 1.8, 0], [0, 0, 1]], dtype=jnp.float32),
        (1, 2, 3, 3))
    variables = net.init(jax.random.PRNGKey(0), images, projs, poses,
                         jnp.zeros((1, 8, 3)))
    grid = jax.jit(lambda v, im: net.apply(
        v, im, projs, poses, ids_encoder=[0], ids_render=[0, 1],
        method=BTSNet.encode))(variables, images)

    # Novel pose: 0.25 m right, 0.05 m up of the keyframe.
    novel = jnp.eye(4).at[0, 3].set(0.25).at[1, 3].set(-0.05)
    sampler = ImageRaySampler(3.0, 80.0, height=H, width=W)
    rays, _ = sampler.sample(None, None, novel[None, None], projs[:, :1])

    for ray_chunk in ray_chunks:
        def frame(v, g, rays, key, n):
            def body(i, acc):
                k = jax.random.fold_in(key, i)

                def query_fn(xyz, coarse):
                    return net.apply(v, g, xyz + acc * 1e-12, coarse=coarse,
                                     method=BTSNet.query)

                out = renderer_lib.render_rays_chunked(
                    query_fn, rays, k, rcfg, ray_chunk=ray_chunk)
                c = out.get("fine", out["coarse"])
                return (acc + jnp.sum(c["rgb"].astype(jnp.float32))
                        + jnp.sum(c["depth"]) + jnp.sum(c["invalid"]))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        t = marginal_time(jax.jit(frame), (variables, grid, rays,
                                           jax.random.PRNGKey(1)), 2, 10)
        # Queried field points per ray: coarse pass + fine pass (the
        # reference fine pass re-queries coarse+fine; reuse queries fine
        # only — renderer.fine_reuse_coarse).
        ppr = rcfg.n_coarse + (0 if not n_fine else
                               (n_fine if reuse else rcfg.n_coarse + n_fine))
        tag = (f"{rcfg.n_coarse}+{n_fine}"
               f"{' reuse' if reuse else ' requery' if n_fine else ''}")
        print(f"NVS frame ({tag}, {ppr} qpts/ray, chunk {ray_chunk:6d}): "
              f"{t * 1e3:7.2f} ms  = {H * W / t / 1e6:6.2f} M rays/s  "
              f"({H * W * ppr / t / 1e6:7.1f} M qpts/s)")


if __name__ == "__main__":
    chunks, kw = [], {}
    for a in sys.argv[1:]:
        if a.startswith("--fine="):          # e.g. --fine=24+16
            c, f = a.split("=")[1].split("+")
            kw["n_coarse"], kw["n_fine"] = int(c), int(f)
        elif a == "--reuse":
            kw["reuse"] = True
        else:
            chunks.append(int(a))
    main(chunks or [16384, 30720, 61440], **kw)
