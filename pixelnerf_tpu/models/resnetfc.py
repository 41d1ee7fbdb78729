"""Conditioned residual MLP — the NeRF field network.

Rebuild of the reference's ResnetFC (src/model/resnetfc.py): ``lin_in`` to
d_hidden, ``n_blocks`` two-layer residual blocks (zero-init second layer),
per-block latent injection ``x += lin_z[blk](z)`` (or SPADE modulation) for
blocks before ``combine_layer``, multi-view mean/max fusion *at*
``combine_layer`` via combine_interleaved, then ``lin_out``.

All layers are Dense -> pure GEMMs; the whole field fuses onto the MXU under
jit. Operates on arbitrary leading batch dims (the reference flattens to 2-D;
we keep (..., d) shapes so vmap/shard_map compose).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.geometry import combine_interleaved

kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def _activation(beta: float):
    if beta > 0:
        return lambda x: nn.softplus(x * beta) / beta
    return nn.relu


class ResnetBlockFC(nn.Module):
    """Two-layer residual FC block (reference resnetfc.py:10-62).

    fc_0 kaiming-init, fc_1 zero-init (block starts as identity), optional
    linear shortcut when sizes differ.
    """

    size_out: int | None = None
    size_h: int | None = None
    beta: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        size_in = x.shape[-1]
        size_out = self.size_out or size_in
        size_h = self.size_h or min(size_in, size_out)
        act = _activation(self.beta)
        net = nn.Dense(size_h, kernel_init=kaiming_normal, name="fc_0")(act(x))
        dx = nn.Dense(size_out, kernel_init=nn.initializers.zeros, name="fc_1")(
            act(net)
        )
        if size_in == size_out:
            x_s = x
        else:
            x_s = nn.Dense(
                size_out, use_bias=False, kernel_init=kaiming_normal, name="shortcut"
            )(x)
        return x_s + dx


class ResnetFC(nn.Module):
    d_in: int
    d_out: int = 4
    n_blocks: int = 5
    d_latent: int = 0
    d_hidden: int = 128
    beta: float = 0.0
    combine_layer: int = 1000
    combine_type: str = "average"
    use_spade: bool = False

    @nn.compact
    def __call__(
        self, zx: jax.Array, combine_inner_dims: Sequence[int] = (1,)
    ) -> jax.Array:
        """:param zx: (..., d_latent + d_in) — latent first, then spatial code
        :param combine_inner_dims: (NS, B); the leading axis is reduced over
            NS at combine_layer (multi-view fusion)
        :return: (..., d_out) with the NS axis folded away if NS > 1
        """
        assert zx.shape[-1] == self.d_latent + self.d_in
        act = _activation(self.beta)
        if self.d_latent > 0:
            z, x = zx[..., : self.d_latent], zx[..., self.d_latent :]
        else:
            z, x = None, zx
        if self.d_in > 0:
            x = nn.Dense(self.d_hidden, kernel_init=kaiming_normal, name="lin_in")(x)
        else:
            x = jnp.zeros(zx.shape[:-1] + (self.d_hidden,), dtype=zx.dtype)

        for blkid in range(self.n_blocks):
            if blkid == self.combine_layer:
                x = combine_interleaved(
                    x.reshape(-1, x.shape[-1]), combine_inner_dims, self.combine_type
                )
                if z is not None:
                    z = None  # latent already injected before the fusion point

            if z is not None and blkid < self.combine_layer:
                tz = nn.Dense(
                    self.d_hidden, kernel_init=kaiming_normal, name=f"lin_z_{blkid}"
                )(z)
                if self.use_spade:
                    sz = nn.Dense(
                        self.d_hidden,
                        kernel_init=kaiming_normal,
                        name=f"scale_z_{blkid}",
                    )(z)
                    x = sz * x + tz
                else:
                    x = x + tz

            x = ResnetBlockFC(beta=self.beta, name=f"block{blkid}")(x)

        return nn.Dense(self.d_out, kernel_init=kaiming_normal, name="lin_out")(act(x))

    @classmethod
    def from_conf(cls, conf, d_in: int, **kwargs) -> "ResnetFC":
        return cls(
            d_in=d_in,
            n_blocks=conf.get_int("n_blocks", 5),
            d_hidden=conf.get_int("d_hidden", 128),
            beta=conf.get_float("beta", 0.0),
            combine_layer=conf.get_int("combine_layer", 1000),
            combine_type=conf.get_string("combine_type", "average"),
            use_spade=conf.get_bool("use_spade", False),
            **kwargs,
        )
