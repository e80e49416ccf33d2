"""NeRF sinusoidal positional encoding.

Matches the reference's output layout exactly (models/common/model/code.py:30-42):
for input x with d_in dims, the encoding is
  [x (if include_input),
   sin(f1*x_1..d), cos(f1*x_1..d), sin(f2*x_1..d), cos(f2*x_1..d), ...]
with f_k = freq_factor * 2**k.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PositionalEncoding:
    num_freqs: int = 6
    d_in: int = 3
    freq_factor: float = float(np.pi)
    include_input: bool = True

    @property
    def d_out(self) -> int:
        d = self.num_freqs * 2 * self.d_in
        return d + self.d_in if self.include_input else d

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., d_in) -> (..., d_out)."""
        freqs = self.freq_factor * (2.0 ** np.arange(self.num_freqs))
        # (..., F, d_in) phase-shift trick: cos(z) = sin(z + pi/2)
        scaled = x[..., None, :] * jnp.asarray(freqs, dtype=x.dtype)[:, None]
        sin = jnp.sin(scaled)
        cos = jnp.cos(scaled)
        # Interleave to [sin(f_k*x), cos(f_k*x)] per frequency, flattened.
        emb = jnp.stack([sin, cos], axis=-2)  # (..., F, 2, d_in)
        emb = emb.reshape(x.shape[:-1] + (self.num_freqs * 2 * self.d_in,))
        if self.include_input:
            emb = jnp.concatenate([x, emb], axis=-1)
        return emb

    def subset(self, dims) -> "PositionalEncoding":
        """Encoder for a subset of input dims (same freqs/layout rules)."""
        return PositionalEncoding(self.num_freqs, len(dims),
                                  self.freq_factor, self.include_input)

    def subset_rows(self, dims) -> np.ndarray:
        """Output-dim indices of the full encoding attributable to input
        `dims`, ordered to match `self.subset(dims)`'s output layout.

        Lets callers split the code into per-ray-constant and per-sample
        parts and hoist the constant half out of inner loops.
        """
        rows = []
        if self.include_input:
            rows += list(dims)
        off = self.d_in if self.include_input else 0
        for k in range(self.num_freqs):
            base = off + 2 * self.d_in * k
            rows += [base + j for j in dims]               # sin block
            rows += [base + self.d_in + j for j in dims]   # cos block
        return np.asarray(rows, dtype=np.int32)

    @classmethod
    def from_conf(cls, conf: dict, d_in: int = 3) -> "PositionalEncoding":
        return cls(
            num_freqs=conf.get("num_freqs", 6),
            d_in=d_in,
            freq_factor=conf.get("freq_factor", float(np.pi)),
            include_input=conf.get("include_input", True),
        )
