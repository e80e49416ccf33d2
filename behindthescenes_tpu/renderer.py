"""Differentiable volume renderer (reference models/common/render/nerf.py).

TPU-native re-design: one fully-vectorized pure function per stage, no
chunking loop — the reference's `eval_batch_size` Python loop
(nerf.py:241-268) disappears because rays are sharded across the device mesh
and XLA tiles the fused point-query over the MXU. Sample counts are static;
the sampling schedule (`sched`) is handled outside jit and triggers a
recompile when sample counts change (rare, by design).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RendererConfig:
    """Mirrors reference NeRFRenderer.__init__ (nerf.py:65-101)."""
    n_coarse: int = 128
    n_fine: int = 0
    n_fine_depth: int = 0
    noise_std: float = 0.0
    depth_std: float = 0.01
    white_bkgd: bool = False
    lindisp: bool = False
    hard_alpha_cap: bool = False
    sched: Optional[Tuple] = None
    # The fine pass reuses the coarse pass's queried sigma/rgb/invalid
    # instead of re-querying the coarse z's (the reference
    # re-queries ALL of sort(concat(z_coarse, z_fine)) — nerf.py:230-238 —
    # so n_coarse + n_fine importance costs n_coarse + (n_coarse + n_fine)
    # field queries). The field is deterministic in position, so caching is
    # output-identical and cuts fine-pass queries to n_fine only.
    # Requires noise_std == 0 (each reference pass draws fresh sigma noise)
    # and an empty mlp_fine. Valid for BOTH serving and training — the
    # reuse is output-identical, so gradients match the re-query formulation
    # too (tests/test_train_fine.py; used by exp_synthetic_flagship_fast).
    fine_reuse_coarse: bool = False

    @property
    def using_fine(self) -> bool:
        return self.n_fine > 0

    @classmethod
    def from_conf(cls, conf: dict, white_bkgd: bool = False) -> "RendererConfig":
        sched = conf.get("sched", None)
        if sched is not None and len(sched) == 0:
            sched = None
        return cls(
            n_coarse=conf.get("n_coarse", 128),
            n_fine=conf.get("n_fine", 0),
            n_fine_depth=conf.get("n_fine_depth", 0),
            noise_std=conf.get("noise_std", 0.0),
            depth_std=conf.get("depth_std", 0.01),
            white_bkgd=conf.get("white_bkgd", white_bkgd),
            lindisp=conf.get("lindisp", True),
            hard_alpha_cap=conf.get("hard_alpha_cap", False),
            sched=tuple(map(tuple, sched)) if sched is not None else None,
            fine_reuse_coarse=conf.get("fine_reuse_coarse", False),
        )


def _z_from_steps(rays, z_steps, lindisp):
    near, far = rays[..., 6:7], rays[..., 7:8]
    if lindisp:
        return 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)
    return near * (1.0 - z_steps) + far * z_steps


def sample_coarse(key, rays, n_coarse: int, lindisp: bool):
    """Stratified sampling (reference nerf.py:103-123).

    rays: (..., 8) -> z: (..., Kc).
    """
    step = 1.0 / n_coarse
    z_steps = jnp.linspace(0.0, 1.0 - step, n_coarse, dtype=rays.dtype)
    z_steps = jnp.broadcast_to(z_steps, rays.shape[:-1] + (n_coarse,))
    z_steps = z_steps + jax.random.uniform(
        key, z_steps.shape, dtype=rays.dtype) * step
    return _z_from_steps(rays, z_steps, lindisp)


def _searchsorted_right(cdf, u):
    """Batched searchsorted(right=True): count of cdf entries <= u.

    cdf: (..., K+1) ascending; u: (..., Kf) -> int32 (..., Kf).
    """
    return jnp.sum(cdf[..., None, :] <= u[..., :, None], axis=-1)


def sample_coarse_from_dist(key, rays, weights, z_samp, n_coarse: int,
                            lindisp: bool):
    """Resample from a coarse weight histogram (reference nerf.py:125-159)."""
    k1, k2 = jax.random.split(key)
    num_samples = n_coarse
    weights = jax.lax.stop_gradient(weights) + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)

    u = jax.random.uniform(k1, rays.shape[:-1] + (num_samples,),
                           dtype=rays.dtype)
    interval_ids = _searchsorted_right(cdf, u) - 1
    interval_ids = jnp.clip(interval_ids, 0, num_samples - 1)
    interval_interp = jax.random.uniform(k2, interval_ids.shape,
                                         dtype=rays.dtype)

    if lindisp:
        z_samp = 1.0 / z_samp

    centers = 0.5 * (z_samp[..., 1:] + z_samp[..., :-1])
    borders = jnp.concatenate(
        [z_samp[..., :1], centers, z_samp[..., -1:]], axis=-1)
    left = jnp.take_along_axis(borders, interval_ids, axis=-1)
    right = jnp.take_along_axis(borders, interval_ids + 1, axis=-1)
    z_new = left * (1.0 - interval_interp) + right * interval_interp
    if lindisp:
        z_new = 1.0 / z_new
    return jnp.sort(z_new, axis=-1)


def sample_fine(key, rays, weights, n_samples: int, n_coarse: int,
                lindisp: bool):
    """Importance sampling from coarse weights (reference nerf.py:161-192)."""
    k1, k2 = jax.random.split(key)
    weights = jax.lax.stop_gradient(weights) + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)

    u = jax.random.uniform(k1, rays.shape[:-1] + (n_samples,),
                           dtype=rays.dtype)
    inds = _searchsorted_right(cdf, u).astype(rays.dtype) - 1.0
    inds = jnp.maximum(inds, 0.0)
    z_steps = (inds + jax.random.uniform(k2, inds.shape,
                                         dtype=rays.dtype)) / n_coarse
    return _z_from_steps(rays, z_steps, lindisp)


def sample_fine_depth(key, rays, depth, n_samples: int, depth_std: float):
    """Gaussian samples around the expected depth (reference nerf.py:194-208)."""
    z_samp = jnp.repeat(depth[..., None], n_samples, axis=-1)
    z_samp = z_samp + jax.random.normal(key, z_samp.shape,
                                        dtype=rays.dtype) * depth_std
    return jnp.clip(z_samp, rays[..., 6:7], rays[..., 7:8])


def weights_from_sigma(sigma, z_samp, cfg: RendererConfig):
    """Alpha compositing weights from densities (nerf.py:283-294).

    sigma, z_samp: (..., K). Returns (weights, alphas) each (..., K).
    """
    deltas = z_samp[..., 1:] - z_samp[..., :-1]
    delta_inf = jnp.full_like(deltas[..., :1], 1e10)
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1)
    alphas = 1.0 - jnp.exp(-jnp.abs(deltas) * jax.nn.relu(sigma))
    if cfg.hard_alpha_cap:
        alphas = alphas.at[..., -1].set(1.0)
    # Transmittance T_k = prod_{j<k}(1-alpha_j) computed in log space with
    # the exclusive cumsum as ONE (..., K)x(K, K) triangular matmul:
    # jnp.cumprod lowers to a log2(K)-pass associative scan over the whole
    # (rays, K) tensor (1.04 ms/frame), while the matmul rides the
    # otherwise-idle MXU and fuses into a single elementwise pass
    # (0.03 ms/frame) — scripts/bench_composite.py. f32 accumulation
    # pinned: the default bf16 matmul costs 1e-3 in the weights.
    # The floor must be a CLAMP, not the reference's `+ 1e-10`: under jit
    # XLA reassociates (1 - a) + 1e-10 into (1 + 1e-10) - a == 1.0 - a,
    # so saturated alphas would hit log(0) = -inf and 0 * -inf = NaN in
    # the matmul (cumprod survived the same fold benignly as a 0 term).
    k = alphas.shape[-1]
    log_terms = jnp.log(jnp.maximum(1.0 - alphas, 1e-10))
    tri = jnp.tril(jnp.ones((k, k), dtype=log_terms.dtype), k=-1)
    log_transmittance = jnp.matmul(log_terms, tri.T, precision="highest")
    weights = alphas * jnp.exp(log_transmittance)
    return weights, alphas


def composite(query_fn: Callable, rays, z_samp, cfg: RendererConfig,
              coarse: bool = True, noise_key=None):
    """Alpha-composite the field along rays (reference nerf.py:210-313).

    Args:
      query_fn: (xyz (n, P, 3), coarse) -> (rgb (n,P,v*3), invalid (n,P,v),
        sigma (n,P,1)).
      rays: (n, B, 8); z_samp: (n, B, K).
    Returns dict: weights (n,B,K), rgb (n,B,v*3), depth (n,B),
      alphas (n,B,K), invalid (n,B,K,v), z_samps, rgb_samps (n,B,K,v*3).
    """
    n, b, k = z_samp.shape
    points = rays[..., None, :3] + z_samp[..., None] * rays[..., None, 3:6]
    points = points.reshape(n, b * k, 3)

    with jax.named_scope("renderer_composite"):
        rgbs, invalid, sigmas = query_fn(points, coarse)
    v3 = rgbs.shape[-1]
    nv = invalid.shape[-1]
    rgbs = rgbs.reshape(n, b, k, v3)
    invalid = invalid.reshape(n, b, k, nv)
    sigmas = sigmas.reshape(n, b, k)

    if cfg.noise_std > 0.0 and noise_key is not None:
        sigmas = sigmas + jax.random.normal(
            noise_key, sigmas.shape, dtype=sigmas.dtype) * cfg.noise_std

    weights, alphas = weights_from_sigma(sigmas, z_samp, cfg)

    rgb_final = jnp.sum(weights[..., None] * rgbs, axis=-2)      # (n, B, v*3)
    depth_final = jnp.sum(weights * z_samp, axis=-1)             # (n, B)
    if cfg.white_bkgd:
        pix_alpha = jnp.sum(weights, axis=-1)
        rgb_final = rgb_final + (1.0 - pix_alpha[..., None])

    return {
        "weights": weights,
        "rgb": rgb_final,
        "depth": depth_final,
        "alphas": alphas,
        "invalid": invalid,
        "z_samps": z_samp,
        "rgb_samps": rgbs,
        "sigmas": sigmas,
    }


def composite_merged(query_fn: Callable, rays, z_cached, cached: dict,
                     z_new, cfg: RendererConfig, coarse: bool = False):
    """Fine-pass composite that reuses the coarse pass's per-sample field
    values and queries ONLY the new fine samples (`fine_reuse_coarse`).

    Compositing runs over the UNSORTED concatenation [z_cached, z_new]:
    sorting is replaced by data-dependent comparison masks — the per-sample
    delta is a masked min over successors and the transmittance's exclusive
    prefix sum (PERF.md finding 11) generalizes from the static triangular
    matrix to the predecessor mask. Ties break by concat index, matching
    jnp.sort's stable order exactly, so outputs equal the reference
    re-query path (nerf.py:230-238) up to float reassociation. Per-sample
    outputs (weights/alphas/z_samps/rgb_samps/invalid) come back in concat
    order — reductions over samples are unaffected; do not feed them to
    order-sensitive consumers (`sample_from_dist`).

    cached: dict with "sigmas" (n,B,Kc), "rgb_samps" (n,B,Kc,v*3),
      "invalid" (n,B,Kc,v) from the coarse composite.
    """
    if cfg.noise_std > 0.0:
        raise ValueError("fine_reuse_coarse requires noise_std == 0")
    n, b, kn = z_new.shape
    points = rays[..., None, :3] + z_new[..., None] * rays[..., None, 3:6]
    points = points.reshape(n, b * kn, 3)
    with jax.named_scope("renderer_composite_fine_new"):
        rgbs_new, invalid_new, sigmas_new = query_fn(points, coarse)
    v3 = rgbs_new.shape[-1]
    nv = invalid_new.shape[-1]

    z_all = jnp.concatenate([z_cached, z_new], axis=-1)          # (n, B, K)
    sigmas = jnp.concatenate(
        [cached["sigmas"], sigmas_new.reshape(n, b, kn)], axis=-1)
    rgbs = jnp.concatenate(
        [cached["rgb_samps"], rgbs_new.reshape(n, b, kn, v3)], axis=-2)
    invalid = jnp.concatenate(
        [cached["invalid"], invalid_new.reshape(n, b, kn, nv)], axis=-2)

    k = z_all.shape[-1]
    zi = z_all[..., :, None]                                     # (n,B,K,1)
    zj = z_all[..., None, :]                                     # (n,B,1,K)
    idx = jnp.arange(k)
    tie_gt = idx[None, :] > idx[:, None]                         # (K, K)
    succ = (zj > zi) | ((zj == zi) & tie_gt)                     # j after i
    # Gap to the next sample in (z, index)-stable order; the maximal sample
    # has no successor and keeps the reference's delta_inf = 1e10.
    deltas = jnp.min(jnp.where(succ, zj - zi, 1e10), axis=-1)    # (n, B, K)
    alphas = 1.0 - jnp.exp(-jnp.abs(deltas) * jax.nn.relu(sigmas))
    if cfg.hard_alpha_cap:
        alphas = jnp.where(deltas >= 1e10, 1.0, alphas)
    log_terms = jnp.log(jnp.maximum(1.0 - alphas, 1e-10))
    # Exclusive prefix sum over predecessors: finding 11's triangular
    # matmul with the data-dependent predecessor mask.
    pred = (~succ).astype(log_terms.dtype) - jnp.eye(k, dtype=log_terms.dtype)
    log_transmittance = jnp.einsum("...ij,...j->...i", pred, log_terms,
                                   precision="highest")
    weights = alphas * jnp.exp(log_transmittance)

    rgb_final = jnp.sum(weights[..., None] * rgbs, axis=-2)
    depth_final = jnp.sum(weights * z_all, axis=-1)
    if cfg.white_bkgd:
        pix_alpha = jnp.sum(weights, axis=-1)
        rgb_final = rgb_final + (1.0 - pix_alpha[..., None])

    return {
        "weights": weights,
        "rgb": rgb_final,
        "depth": depth_final,
        "alphas": alphas,
        "invalid": invalid,
        "z_samps": z_all,
        "rgb_samps": rgbs,
        "sigmas": sigmas,
    }


def _prune(out: dict, want_weights, want_alphas, want_z_samps,
           want_rgb_samps) -> dict:
    res = {"rgb": out["rgb"], "depth": out["depth"], "invalid": out["invalid"]}
    if want_weights:
        res["weights"] = out["weights"]
    if want_alphas:
        res["alphas"] = out["alphas"]
    if want_z_samps:
        res["z_samps"] = out["z_samps"]
    if want_rgb_samps:
        res["rgb_samps"] = out["rgb_samps"]
    return res


def render_rays(query_fn: Callable, rays, key, cfg: RendererConfig,
                want_weights: bool = False, want_alphas: bool = False,
                want_z_samps: bool = False, want_rgb_samps: bool = False,
                sample_from_dist=None) -> dict:
    """Full render pass (reference nerf.py:315-375).

    rays: (n, B, 8). Returns {"coarse": {...}[, "fine": {...}]}.
    """
    k_coarse, k_fine, k_fd, k_noise_c, k_noise_f = jax.random.split(key, 5)

    if sample_from_dist is None:
        z_coarse = sample_coarse(k_coarse, rays, cfg.n_coarse, cfg.lindisp)
    else:
        prop_weights, prop_z = sample_from_dist
        z_coarse = sample_coarse_from_dist(
            k_coarse, rays, prop_weights, prop_z, cfg.n_coarse, cfg.lindisp)

    coarse_out = composite(query_fn, rays, z_coarse, cfg, coarse=True,
                           noise_key=k_noise_c)
    outputs = {"coarse": _prune(coarse_out, want_weights, want_alphas,
                                want_z_samps, want_rgb_samps)}

    if cfg.using_fine:
        new_samps = []
        if cfg.n_fine - cfg.n_fine_depth > 0:
            new_samps.append(sample_fine(
                k_fine, rays, jax.lax.stop_gradient(coarse_out["weights"]),
                cfg.n_fine - cfg.n_fine_depth, cfg.n_coarse, cfg.lindisp))
        if cfg.n_fine_depth > 0:
            new_samps.append(sample_fine_depth(
                k_fd, rays, coarse_out["depth"], cfg.n_fine_depth,
                cfg.depth_std))
        if cfg.fine_reuse_coarse and cfg.noise_std == 0.0:
            z_new = jnp.concatenate(new_samps, axis=-1)
            fine_out = composite_merged(query_fn, rays, z_coarse,
                                        coarse_out, z_new, cfg, coarse=False)
        else:
            z_combine = jnp.sort(
                jnp.concatenate([z_coarse] + new_samps, axis=-1), axis=-1)
            fine_out = composite(query_fn, rays, z_combine, cfg,
                                 coarse=False, noise_key=k_noise_f)
        outputs["fine"] = _prune(fine_out, want_weights, want_alphas,
                                 want_z_samps, want_rgb_samps)
    return outputs


def render_rays_chunked(query_fn: Callable, rays, key, cfg: RendererConfig,
                        ray_chunk: int = 16384, remat_body: bool = False,
                        mesh=None, **want) -> dict:
    """Full-frame rendering: sequential `lax.map` over ray chunks INSIDE one
    jit program — the TPU-native replacement for the reference's Python
    `eval_batch_size` loop (nerf.py:241-268). Bounds peak HBM for the
    ~8M-point per-frame query workload while keeping a single compiled
    computation; chunk size trades memory for MXU utilization.

    mesh: optional (data, rays) Mesh — each chunk's ray axis is sharded
    over the mesh's `rays` axis (the feature grid and params replicate),
    so a full frame renders across every chip. `ray_chunk` then counts
    rays PER DEVICE: the global chunk scales with the mesh so per-chip
    memory and MXU batch stay as tuned for one chip.

    rays: (n, B, 8); returns the same dict as render_rays.
    """
    constrain = None
    if mesh is not None and mesh.shape.get("rays", 1) > 1:
        from behindthescenes_tpu.parallel.mesh import ray_sharding
        spec = ray_sharding(mesh)
        ray_chunk = ray_chunk * mesh.shape["rays"]

        def constrain(r):
            return jax.lax.with_sharding_constraint(r, spec)

    n, b, _ = rays.shape
    if b <= ray_chunk:
        if constrain is None:
            return render_rays(query_fn, rays, key, cfg, **want)
        # Pad the ray axis to a multiple of the mesh width so the
        # constraint always applies — silently skipping it for
        # non-divisible frame shapes would drop the whole multi-chip
        # speedup for exactly those frames.
        r_ax = mesh.shape["rays"]
        pad = (-b) % r_ax
        if pad:
            rays_p = jnp.pad(rays, [(0, 0), (0, pad), (0, 0)])
            # Padded rays stay renderable with each batch entry's own
            # near/far (their outputs are sliced off below regardless).
            rays_p = rays_p.at[:, b:, 6:8].set(rays[:, -1:, 6:8])
        else:
            rays_p = rays
        out = render_rays(query_fn, constrain(rays_p), key, cfg, **want)
        if pad:
            out = jax.tree_util.tree_map(lambda x: x[:, :b], out)
        return out
    num_chunks = -(-b // ray_chunk)
    pad = num_chunks * ray_chunk - b
    rays_p = jnp.pad(rays, [(0, 0), (0, pad), (0, 0)])
    if pad:
        # Padded rays must stay renderable: give them each batch entry's
        # own last-ray bounds (outputs for them are sliced off below).
        rays_p = rays_p.at[:, b:, 6:8].set(rays[:, -1:, 6:8])
    chunks = rays_p.reshape(n, num_chunks, ray_chunk, 8)
    chunks = jnp.moveaxis(chunks, 1, 0)  # (C, n, chunk, 8)

    def body(args):
        idx, chunk_rays = args
        if constrain is not None:
            chunk_rays = constrain(chunk_rays)
        k = jax.random.fold_in(key, idx)
        return render_rays(query_fn, chunk_rays, k, cfg, **want)

    if remat_body:
        # Per-chunk rematerialization: the backward pass re-runs each
        # chunk's point-query graph instead of storing its activations —
        # training memory becomes constant in the number of rays.
        body = jax.checkpoint(body)

    outs = jax.lax.map(body, (jnp.arange(num_chunks), chunks))

    def merge(x):
        # (C, n, chunk, ...) -> (n, C*chunk, ...) -> strip padding
        x = jnp.moveaxis(x, 0, 1)
        x = x.reshape((n, num_chunks * ray_chunk) + x.shape[3:])
        return x[:, :b]

    return jax.tree_util.tree_map(merge, outs)


class SampleScheduler:
    """Sample-count schedule (reference nerf.py:403-423). Lives outside jit;
    changing counts recompiles the render fn (static shapes)."""

    def __init__(self, cfg: RendererConfig):
        self.cfg = cfg
        self.iter_idx = 0
        self.last_sched = 0

    def step(self, steps: int = 1) -> RendererConfig:
        sched = self.cfg.sched
        if sched is None:
            return self.cfg
        self.iter_idx += steps
        n_coarse, n_fine = self.cfg.n_coarse, self.cfg.n_fine
        while (self.last_sched < len(sched[0])
               and self.iter_idx >= sched[0][self.last_sched]):
            n_coarse = sched[1][self.last_sched]
            n_fine = sched[2][self.last_sched]
            self.last_sched += 1
        if (n_coarse, n_fine) != (self.cfg.n_coarse, self.cfg.n_fine):
            self.cfg = dataclasses.replace(self.cfg, n_coarse=n_coarse,
                                           n_fine=n_fine)
        return self.cfg

    def state_dict(self):
        return {"iter_idx": self.iter_idx, "last_sched": self.last_sched}

    def load_state_dict(self, d):
        self.iter_idx = int(d["iter_idx"])
        self.last_sched = int(d["last_sched"])
