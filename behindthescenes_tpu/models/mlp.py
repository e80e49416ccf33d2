"""Field MLPs: ResnetFC (default) and ImplicitNet (IGR-style alternative).

Capability parity with reference models/common/model/resnetfc.py:10-198 and
mlp.py:1-137, re-built as Flax modules. The MLP is tiny (d_hidden=64,
n_blocks=0 in the shipped KITTI configs) — on TPU it runs as a couple of
batched matmuls that XLA (or the fused Pallas ray-march kernel) keeps in VMEM.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def combine_interleaved(t: jnp.ndarray, inner_dims: Sequence[int] = (1,),
                        agg_type: str = "average") -> jnp.ndarray:
    """Multiview reduction used by pixelNeRF-style combining
    (reference util.py:458-468)."""
    if len(inner_dims) == 1 and inner_dims[0] == 1:
        return t
    t = t.reshape((-1,) + tuple(inner_dims) + t.shape[1:])
    if agg_type == "average":
        return jnp.mean(t, axis=1)
    if agg_type == "max":
        return jnp.max(t, axis=1)
    raise NotImplementedError(f"Unsupported combine type {agg_type}")


class ResnetBlockFC(nn.Module):
    """Fully-connected ResNet block (reference resnetfc.py:10-62).

    fc_1 is zero-initialized so the block starts as identity.
    """
    size_out: int | None = None
    size_h: int | None = None
    beta: float = 0.0

    @nn.compact
    def __call__(self, x):
        size_in = x.shape[-1]
        size_out = self.size_out or size_in
        size_h = self.size_h or min(size_in, size_out)
        act = (lambda v: nn.softplus(self.beta * v) / self.beta) \
            if self.beta > 0 else nn.relu
        net = nn.Dense(size_h, kernel_init=_kaiming, name="fc_0")(act(x))
        dx = nn.Dense(size_out, kernel_init=nn.initializers.zeros,
                      name="fc_1")(act(net))
        if size_in == size_out:
            x_s = x
        else:
            x_s = nn.Dense(size_out, use_bias=False, kernel_init=_kaiming,
                           name="shortcut")(x)
        return x_s + dx


class ResnetFC(nn.Module):
    """Residual FC field network (reference resnetfc.py:65-198).

    Setup-style so the hot path can enter through `call_split`, which
    exploits that along a self-view ray only the positional code changes
    per sample: the feature half of lin_in is applied once per ray and
    broadcast over samples.
    """
    d_out: int = 4
    n_blocks: int = 5
    d_hidden: int = 128
    beta: float = 0.0
    combine_layer: int = 1000
    combine_type: str = "average"
    use_spade: bool = False
    d_latent: int = 0
    dtype: Any = None  # computation dtype for the matmuls (params stay f32)

    def setup(self):
        self.lin_in = nn.Dense(self.d_hidden, kernel_init=_kaiming,
                               dtype=self.dtype, name="lin_in")
        self.lin_out = nn.Dense(self.d_out, kernel_init=_kaiming,
                                dtype=self.dtype, name="lin_out")
        self.blocks = [ResnetBlockFC(beta=self.beta, name=f"block_{i}")
                       for i in range(self.n_blocks)]
        if self.d_latent > 0:
            n_lin_z = min(self.combine_layer, self.n_blocks)
            self.lin_z = [nn.Dense(self.d_hidden, kernel_init=_kaiming,
                                   name=f"lin_z_{i}") for i in range(n_lin_z)]
            if self.use_spade:
                self.scale_z = [nn.Dense(self.d_hidden, kernel_init=_kaiming,
                                         name=f"scale_z_{i}")
                                for i in range(n_lin_z)]

    def _act(self, v):
        if self.beta > 0:
            return nn.softplus(self.beta * v) / self.beta
        return nn.relu(v)

    def _tail(self, x, z, combine_inner_dims):
        for blkid in range(self.n_blocks):
            if blkid == self.combine_layer:
                x = combine_interleaved(x, combine_inner_dims,
                                        self.combine_type)
            if z is not None and blkid < self.combine_layer:
                tz = self.lin_z[blkid](z)
                if self.use_spade:
                    x = self.scale_z[blkid](z) * x + tz
                else:
                    x = x + tz
            x = self.blocks[blkid](x)
        return self.lin_out(self._act(x))

    def __call__(self, zx, combine_inner_dims: Sequence[int] = (1,)):
        if self.d_latent > 0:
            z = zx[..., :self.d_latent]
            x = zx[..., self.d_latent:]
        else:
            z = None
            x = zx
        x = self.lin_in(x)
        return self._tail(x, z, combine_inner_dims)

    def call_split(self, x_static, x_dynamic, rows_static=None,
                   rows_dynamic=None):
        """lin_in over a split input with the static half hoisted.

        Along a self-view ray only part of the input changes per sample;
        the static part's contribution to lin_in is computed once per ray
        and broadcast over samples (a large FLOP saving: the static half is
        ~90 of the 103 input dims in the flagship config).

        x_static: (..., cs) per-ray inputs; x_dynamic: (..., K, cd)
        per-sample inputs. rows_static/rows_dynamic: index arrays mapping
        each split input dim to its row of the lin_in kernel (default: the
        first cs / last cd rows). Requires d_latent == 0.
        """
        assert self.d_latent == 0
        kernel = self.lin_in.variables["params"]["kernel"]
        bias = self.lin_in.variables["params"]["bias"]
        cs = x_static.shape[-1]
        if rows_static is None:
            w_s = kernel[:cs]
            w_d = kernel[cs:]
        else:
            w_s = kernel[jnp.asarray(rows_static)]
            w_d = kernel[jnp.asarray(rows_dynamic)]
        dt = self.dtype or x_static.dtype
        h_static = jnp.dot(x_static.astype(dt), w_s.astype(dt))
        h_dyn = jnp.dot(x_dynamic.astype(dt), w_d.astype(dt))
        x = h_static[..., None, :] + h_dyn + bias.astype(dt)
        return self._tail(x, None, (1,))

    def call_split_jitter(self, x_static, coord, rows_static, rows_dynamic,
                          *, n_freqs: int, freq_factor: float):
        """Fused Pallas variant of `call_split` for the stratified-jitter
        self-view density decode: the per-sample input is a SCALAR coord
        (B, K) whose 13-dim positional code and the following
        lin_in/relu/lin_out run entirely in VMEM
        (ops/pallas/jitter_density.py) — the (B, K, 13) code and (B, K, H)
        hidden tensors never reach HBM.

        Returns (B, K) pre-activation logits of the DENSITY column only.
        Requires n_blocks == 0, beta == 0, d_latent == 0 and the
        interleaved [id, sin f, cos f, ...] code layout (include_input).
        """
        assert self.d_latent == 0 and self.n_blocks == 0 and self.beta == 0
        from behindthescenes_tpu.ops.pallas.jitter_density import (
            jitter_density_pallas)
        kernel = self.lin_in.variables["params"]["kernel"]
        bias = self.lin_in.variables["params"]["bias"]
        w_s = kernel[jnp.asarray(rows_static)]
        w_d = kernel[jnp.asarray(rows_dynamic)]
        dt = self.dtype or x_static.dtype
        h_static = jnp.dot(x_static.astype(dt), w_s.astype(dt))
        w_out = self.lin_out.variables["params"]["kernel"][:, :1]
        b_out = self.lin_out.variables["params"]["bias"][0]
        return jitter_density_pallas(
            coord.astype(jnp.float32), h_static, w_d, bias, w_out, b_out,
            n_freqs=n_freqs, freq_factor=freq_factor,
            interpret=jax.default_backend() != "tpu")

    def call_split_shared(self, x_static, x_dynamic_shared,
                          rows_static=None, rows_dynamic=None):
        """call_split where the dynamic inputs are SHARED across the batch:
        x_static (B, cs), x_dynamic_shared (K, cd) -> (B, K, d_out).

        The dynamic half of lin_in is a tiny (K, hidden) table; the combined
        hidden activation is an outer sum the compiler loop-fuses with the
        following ReLU/output reduction — no (B, K, hidden) tensor ever
        reaches HBM. Used by deterministic self-view inference.
        """
        assert self.d_latent == 0
        kernel = self.lin_in.variables["params"]["kernel"]
        bias = self.lin_in.variables["params"]["bias"]
        cs = x_static.shape[-1]
        if rows_static is None:
            w_s = kernel[:cs]
            w_d = kernel[cs:]
        else:
            w_s = kernel[jnp.asarray(rows_static)]
            w_d = kernel[jnp.asarray(rows_dynamic)]
        dt = self.dtype or x_static.dtype
        h_static = jnp.dot(x_static.astype(dt), w_s.astype(dt))   # (B, H)
        h_dyn = (jnp.dot(x_dynamic_shared.astype(dt), w_d.astype(dt))
                 + bias.astype(dt))                                # (K, H)
        if self.n_blocks == 0 and self.beta == 0:
            # Fused Pallas tail: XLA materializes the (B, K, H) rectified
            # tensor in HBM (~2GB of traffic at flagship depth-render
            # shapes); the kernel keeps it in VMEM (ops/pallas/shared_z.py).
            from behindthescenes_tpu.ops.pallas.shared_z import shared_z_tail
            w_out = self.lin_out.variables["params"]["kernel"]
            b_out = self.lin_out.variables["params"]["bias"]
            return shared_z_tail(h_static, h_dyn, w_out.astype(dt), b_out)
        x = h_static[:, None, :] + h_dyn[None, :, :]
        return self._tail(x, None, (1,))


class ImplicitNet(nn.Module):
    """IGR-style MLP with skip connections (reference mlp.py:9-137)."""
    d_out: int = 4
    dims: Sequence[int] = (128, 128, 128, 128)
    skip_in: Sequence[int] = ()
    combine_layer: int = 1000
    combine_type: str = "average"
    beta: float = 0.0

    @nn.compact
    def __call__(self, x, combine_inner_dims: Sequence[int] = (1,)):
        act = (lambda v: nn.softplus(self.beta * v) / self.beta) \
            if self.beta > 0 else nn.relu
        d_in = x.shape[-1]
        dims = [d_in] + list(self.dims) + [self.d_out]
        x_init = x
        for layer in range(len(dims) - 1):
            if layer == self.combine_layer:
                x = combine_interleaved(x, combine_inner_dims,
                                        self.combine_type)
                x_init = combine_interleaved(x_init, combine_inner_dims,
                                             self.combine_type)
            if layer in self.skip_in:
                x = jnp.concatenate([x, x_init], axis=-1) / jnp.sqrt(2.0)
            x = nn.Dense(dims[layer + 1], name=f"lin_{layer}")(x)
            if layer < len(dims) - 2:
                x = act(x)
        return x


def make_mlp(conf: dict, d_out: int = 4, allow_empty: bool = False,
             dtype=None):
    """MLP factory (reference mlp_util.py:5-15): type mlp|resnet|empty."""
    mlp_type = conf.get("type", "mlp")
    if mlp_type == "mlp":
        return ImplicitNet(
            d_out=d_out,
            dims=tuple(conf.get("dims", [128, 128, 128, 128])),
            skip_in=tuple(conf.get("skip_in", ())),
            combine_layer=conf.get("combine_layer", 1000),
            combine_type=conf.get("combine_type", "average"),
            beta=conf.get("beta", 0.0),
        )
    if mlp_type == "resnet":
        return ResnetFC(
            d_out=d_out,
            n_blocks=conf.get("n_blocks", 5),
            d_hidden=conf.get("d_hidden", 128),
            beta=conf.get("beta", 0.0),
            combine_layer=conf.get("combine_layer", 1000),
            combine_type=conf.get("combine_type", "average"),
            use_spade=conf.get("use_spade", False),
            dtype=dtype,
        )
    if mlp_type == "empty" and allow_empty:
        return None
    raise NotImplementedError(f"Unsupported MLP type: {mlp_type}")
