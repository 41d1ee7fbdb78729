"""IGR-style plain MLP field (alternate to ResnetFC).

Counterpart of the reference's ImplicitNet (src/model/mlp.py): input-skip
concats scaled by 1/sqrt(2), optional geometric (sphere-SDF) initialization,
and the same combine_interleaved multi-view fusion hook. Note the reference's
factory has a latent bug (model_util.py:8 never imports ImplicitNet, so
``type = mlp`` raises NameError); here it is actually selectable.
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.geometry import combine_interleaved
from .resnetfc import _activation, kaiming_normal


class ImplicitNet(nn.Module):
    d_in: int
    dims: Tuple[int, ...]
    skip_in: Tuple[int, ...] = ()
    d_out: int = 4
    geometric_init: bool = True
    radius_init: float = 0.3
    beta: float = 0.0
    output_init_gain: float = 2.0
    num_position_inputs: int = 3
    sdf_scale: float = 1.0
    dim_excludes_skip: bool = False
    combine_layer: int = 1000
    combine_type: str = "average"
    dtype: Any = jnp.float32

    def _layer_dims(self):
        dims = [self.d_in] + list(self.dims) + [self.d_out]
        if self.dim_excludes_skip:
            for i in range(1, len(dims) - 1):
                if i in self.skip_in:
                    dims[i] += self.d_in
        return dims

    def _kernel_init(self, layer: int, num_layers: int, in_dim: int, out_dim: int):
        """Per-layer initializer replicating the reference's geometric init
        (transposed to flax's (in, out) kernel layout)."""
        if not self.geometric_init:
            return kaiming_normal

        def init(key, shape, dtype=jnp.float32):
            kt = jax.random.normal(key, (shape[1], shape[0]), dtype)  # (out, in)
            if layer == num_layers - 2:
                mean = -math.sqrt(math.pi) / math.sqrt(in_dim) * self.sdf_scale
                kt = kt.at[0].set(kt[0] * 1e-5 + mean)
                if self.d_out > 1:
                    kt = kt.at[1:].set(kt[1:] * self.output_init_gain)
            else:
                kt = kt * (math.sqrt(2.0) / math.sqrt(out_dim))
            if self.d_in > self.num_position_inputs and (
                layer == 0 or layer in self.skip_in
            ):
                kt = kt.at[:, -self.d_in + self.num_position_inputs :].set(0.0)
            return kt.T
        return init

    def _bias_init(self, layer: int, num_layers: int):
        if self.geometric_init and layer == num_layers - 2:
            def init(key, shape, dtype=jnp.float32):
                b = jnp.zeros(shape, dtype)
                return b.at[0].set(self.radius_init)
            return init
        return nn.initializers.zeros

    @nn.compact
    def __call__(
        self, x, combine_inner_dims: Sequence[int] = (1,), fast: bool = False
    ) -> jax.Array:
        del fast  # no fused kernel for this architecture yet
        if isinstance(x, (tuple, list)):  # (z, x) convention from the field
            x = jnp.concatenate([v for v in x if v is not None], axis=-1)
        dims = self._layer_dims()
        num_layers = len(dims)
        act = _activation(self.beta)
        x_init = x
        for layer in range(num_layers - 1):
            if layer + 1 in self.skip_in:
                out_dim = dims[layer + 1] - self.d_in
            else:
                out_dim = dims[layer + 1]

            if layer == self.combine_layer:
                x = combine_interleaved(
                    x.reshape(-1, x.shape[-1]), combine_inner_dims, self.combine_type
                )
                x_init = combine_interleaved(
                    x_init.reshape(-1, x_init.shape[-1]),
                    combine_inner_dims,
                    self.combine_type,
                )

            if layer < self.combine_layer and layer in self.skip_in:
                x = jnp.concatenate([x, x_init], axis=-1) / np.sqrt(2)

            x = nn.Dense(
                out_dim,
                kernel_init=self._kernel_init(layer, num_layers, dims[layer], out_dim),
                bias_init=self._bias_init(layer, num_layers),
                dtype=self.dtype,
                name=f"lin{layer}",
            )(x)
            if layer < num_layers - 2:
                x = act(x)
        return x.astype(jnp.float32)

    @classmethod
    def from_conf(cls, conf, d_in: int, **kwargs) -> "ImplicitNet":
        return cls(
            d_in=d_in,
            dims=tuple(conf.get_list("dims")),
            skip_in=tuple(conf.get_list("skip_in", [])),
            beta=conf.get_float("beta", 0.0),
            dim_excludes_skip=conf.get_bool("dim_excludes_skip", False),
            combine_layer=conf.get_int("combine_layer", 1000),
            combine_type=conf.get_string("combine_type", "average"),
            dtype=jnp.dtype(conf.get_string("dtype", "float32")),
            **kwargs,
        )
