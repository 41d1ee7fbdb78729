"""NeRF sinusoidal positional encoding (reference src/model/code.py).

Pure function of its static configuration — no parameters, so it is a plain
dataclass rather than a module. Output layout matches the reference exactly
(input first if ``include_input``, then interleaved (sin, cos) per frequency,
frequency-major): checkpoint parity depends on the column order feeding the
first MLP layer.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PositionalEncoding:
    num_freqs: int = 6
    d_in: int = 3
    freq_factor: float = math.pi
    include_input: bool = True

    @property
    def d_out(self) -> int:
        return self.num_freqs * 2 * self.d_in + (self.d_in if self.include_input else 0)

    def __call__(self, x: jax.Array) -> jax.Array:
        """(..., d_in) -> (..., d_out)."""
        freqs = self.freq_factor * 2.0 ** np.arange(self.num_freqs, dtype=np.float32)
        freqs2 = np.repeat(freqs, 2)                       # f1 f1 f2 f2 ...
        phases = np.zeros(2 * self.num_freqs, dtype=np.float32)
        phases[1::2] = math.pi * 0.5                       # sin, cos, sin, cos ...
        embed = jnp.sin(
            x[..., None, :] * freqs2[:, None] + phases[:, None]
        )                                                  # (..., 2F, d_in)
        embed = embed.reshape(*x.shape[:-1], 2 * self.num_freqs * self.d_in)
        if self.include_input:
            embed = jnp.concatenate([x, embed], axis=-1)
        return embed

    @classmethod
    def from_conf(cls, conf, d_in: int = 3) -> "PositionalEncoding":
        return cls(
            num_freqs=conf.get_int("num_freqs", 6),
            d_in=d_in,
            freq_factor=conf.get_float("freq_factor", math.pi),
            include_input=conf.get_bool("include_input", True),
        )
