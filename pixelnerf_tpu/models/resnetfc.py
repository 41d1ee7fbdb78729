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

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.geometry import combine_interleaved

kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def _activation(beta: float):
    if beta > 0:
        return lambda x: nn.softplus(x * beta) / beta
    return nn.relu


def _kernel_params_sub(p):
    """Re-nest the declared param arrays into the dict layout
    ``ops.fused_mlp.pack_weights`` consumes."""
    sub = {"lin_in": dict(zip(("kernel", "bias"), p["lin_in"]))}
    for i, (k, b) in enumerate(p["lin_z"]):
        sub[f"lin_z_{i}"] = {"kernel": k, "bias": b}
    for i, (k0, b0, k1, b1) in enumerate(p["blocks"]):
        sub[f"block{i}"] = {
            "fc_0": {"kernel": k0, "bias": b0},
            "fc_1": {"kernel": k1, "bias": b1},
        }
    sub["lin_out"] = dict(zip(("kernel", "bias"), p["lin_out"]))
    return sub


class ResnetBlockFC(nn.Module):
    """Two-layer residual FC block (reference resnetfc.py:10-62).

    fc_0 kaiming-init, fc_1 zero-init (block starts as identity), optional
    linear shortcut when sizes differ.
    """

    size_out: int | None = None
    size_h: int | None = None
    beta: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        size_in = x.shape[-1]
        size_out = self.size_out or size_in
        size_h = self.size_h or min(size_in, size_out)
        act = _activation(self.beta)
        net = nn.Dense(
            size_h, kernel_init=kaiming_normal, dtype=self.dtype, name="fc_0"
        )(act(x))
        dx = nn.Dense(
            size_out, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="fc_1"
        )(act(net))
        if size_in == size_out:
            x_s = x
        else:
            x_s = nn.Dense(
                size_out, use_bias=False, kernel_init=kaiming_normal,
                dtype=self.dtype, name="shortcut",
            )(x)
        return x_s + dx


class _DeclaredLinear(nn.Module):
    """Parameter container shaped/named like nn.Dense but *not* applied at its
    own call site — the caller computes with the returned arrays. Keeps the
    checkpoint layout (``lin_z_k/kernel``) while letting ResnetFC fuse GEMMs
    or hand the weights to the Pallas kernel."""

    d_in: int
    features: int
    kernel_init: Any = kaiming_normal

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init, (self.d_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _DeclaredBlock(nn.Module):
    """Parameter container matching ResnetBlockFC's tree (fc_0 kaiming,
    fc_1 zero-init)."""

    d_hidden: int

    @nn.compact
    def __call__(self):
        k0, b0 = _DeclaredLinear(self.d_hidden, self.d_hidden, name="fc_0")()
        k1, b1 = _DeclaredLinear(
            self.d_hidden, self.d_hidden, kernel_init=nn.initializers.zeros,
            name="fc_1",
        )()
        return k0, b0, k1, b1


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
    dtype: Any = jnp.float32  # compute dtype; params stay f32

    def _declare(self):
        """Declare the full parameter tree (same names/shapes the reference's
        state_dict maps to) and return the raw arrays."""
        p = {}
        if self.d_in > 0:
            p["lin_in"] = _DeclaredLinear(self.d_in, self.d_hidden, name="lin_in")()
        n_lin_z = min(self.combine_layer, self.n_blocks)
        if self.d_latent > 0:
            p["lin_z"] = [
                _DeclaredLinear(self.d_latent, self.d_hidden, name=f"lin_z_{i}")()
                for i in range(n_lin_z)
            ]
            if self.use_spade:
                p["scale_z"] = [
                    _DeclaredLinear(self.d_latent, self.d_hidden, name=f"scale_z_{i}")()
                    for i in range(n_lin_z)
                ]
        p["blocks"] = [
            _DeclaredBlock(self.d_hidden, name=f"block{i}")()
            for i in range(self.n_blocks)
        ]
        p["lin_out"] = _DeclaredLinear(self.d_hidden, self.d_out, name="lin_out")()
        return p

    def _can_use_kernel(self, z, x, single_view: bool) -> bool:
        return (
            self.beta <= 0.0
            and not self.use_spade
            and self.d_latent > 0
            and self.d_in > 0
            and z is not None
            and single_view
            and self.dtype == jnp.bfloat16
        )

    @property
    def n_lin_z(self) -> int:
        return min(self.combine_layer, self.n_blocks) if self.d_latent > 0 else 0

    @nn.compact
    def __call__(
        self,
        zx,
        combine_inner_dims: Sequence[int] = (1,),
        fast: bool = False,
        z_pretransformed: bool = False,
        gather: Optional[tuple] = None,
    ) -> jax.Array:
        """:param zx: (..., d_latent + d_in) — latent first, then spatial
            code — or a tuple ``(z, x)`` kept unconcatenated (avoids
            materializing the concat in the hot path)
        :param combine_inner_dims: (NS, B); the leading axis is reduced over
            NS at combine_layer (multi-view fusion)
        :param fast: allow the fused Pallas inference kernel (single-view,
            ReLU, bf16; falls back to XLA otherwise). Inference only.
        :param z_pretransformed: ``z`` already holds the latent injections
            ``z_raw @ concat(lin_z kernels) + concat(biases)`` of width
            ``n_lin_z * d_hidden`` (see pixelnerf.bake_encoding — the lin_z
            GEMM was folded into the feature map at encode, exact because
            bilinear interpolation commutes with linear maps). Skips the
            injection GEMM here. Not valid with SPADE.
        :return: (..., d_out) with the NS axis folded away if NS > 1
        """
        act = _activation(self.beta)
        if z_pretransformed:
            assert not self.use_spade, "baked injections incompatible with SPADE"
            assert isinstance(zx, (tuple, list)), "baked z requires (z, x) form"
        if isinstance(zx, (tuple, list)):
            z, x = zx
            z = z.astype(self.dtype) if z is not None else None
            x = x.astype(self.dtype)
            expect_z = (
                self.n_lin_z * self.d_hidden if z_pretransformed else self.d_latent
            )
            if gather is None:
                assert (0 if z is None else z.shape[-1]) == expect_z
            assert x.shape[-1] == self.d_in
        else:
            assert zx.shape[-1] == self.d_latent + self.d_in
            zx = zx.astype(self.dtype)
            if self.d_latent > 0:
                z, x = zx[..., : self.d_latent], zx[..., self.d_latent :]
            else:
                z, x = None, zx

        p = self._declare()
        dt = self.dtype
        single_view = (
            len(combine_inner_dims) == 1 or combine_inner_dims[0] == 1
        ) or self.combine_layer >= self.n_blocks

        if gather is not None:
            # fused gather+MLP kernel: the pixel-aligned gather runs inside
            # the MLP kernel, pipelined against the GEMMs (ops/fused_field).
            # Deliberate opt-in (PixelNeRFNet.query_fused) — assert, don't
            # silently fall back.
            assert fast and z is None and not z_pretransformed
            ok = (
                self.beta <= 0.0
                and not self.use_spade
                and self.d_latent > 0
                and self.d_in > 0
                and single_view
                and self.dtype == jnp.bfloat16
            )
            assert ok, (
                "fused gather path requires ReLU, bf16, d_latent>0, "
                "single-view"
            )
            from ..ops.fused_field import fused_gather_resnetfc_infer
            from ..ops.fused_mlp import pack_weights as _pack_w

            params_sub = _kernel_params_sub(p)
            weights = _pack_w(
                params_sub, self.n_blocks, self.combine_layer,
                self.d_latent, self.d_in, self.d_hidden,
            )
            table, base, wg = gather
            lead = x.shape[:-1]
            out = fused_gather_resnetfc_infer(
                table,
                base.reshape(-1, 2),
                wg.reshape(-1, 2),
                x.reshape(-1, self.d_in),
                weights,
                self.n_blocks,
                self.combine_layer,
                interpret=jax.default_backend() != "tpu",
            )
            out = out[..., : self.d_out]
            if (
                self.combine_layer < self.n_blocks
                and len(combine_inner_dims) > 1
            ):
                out = out.reshape(-1, combine_inner_dims[-1], self.d_out)
            else:
                out = out.reshape(*lead, self.d_out)
            return out.astype(jnp.float32)

        if fast and self._can_use_kernel(z, x, single_view):
            from ..ops.fused_mlp import fused_resnetfc_infer, pack_weights

            params_sub = _kernel_params_sub(p)
            weights = pack_weights(
                params_sub, self.n_blocks, self.combine_layer,
                self.d_latent, self.d_in, self.d_hidden,
            )
            d_z = self.d_latent
            if z_pretransformed:
                # injections already in z; ship dummy wz/bz (unused)
                weights = weights[:2] + (
                    jnp.zeros((128, 128), jnp.bfloat16),
                    jnp.zeros((1, 128), jnp.bfloat16),
                ) + weights[4:]
                d_z = self.n_lin_z * self.d_hidden
            lead = x.shape[:-1]
            out = fused_resnetfc_infer(
                z.reshape(-1, d_z),
                x.reshape(-1, self.d_in),
                weights,
                self.n_blocks,
                self.combine_layer,
                interpret=jax.default_backend() != "tpu",
                z_is_tz=z_pretransformed,
            )
            out = out[..., : self.d_out]
            if (
                self.combine_layer < self.n_blocks
                and len(combine_inner_dims) > 1
            ):
                # the XLA path folds to (SB, B, d) at the combine layer even
                # for NS=1; mirror that output shape
                out = out.reshape(-1, combine_inner_dims[-1], self.d_out)
            else:
                out = out.reshape(*lead, self.d_out)
            return out.astype(jnp.float32)

        def dense(a, kb):
            k, b = kb
            return a @ k.astype(dt) + b.astype(dt)

        tz_list = sz_list = None
        if z is not None and self.d_latent > 0:
            if z_pretransformed:
                tz_all = z
            else:
                # all latent injections as ONE GEMM: reads the big z tensor
                # once instead of n_lin_z times (the hot path is HBM-bound)
                K = jnp.concatenate([k for k, _ in p["lin_z"]], axis=1).astype(dt)
                B = jnp.concatenate([b for _, b in p["lin_z"]]).astype(dt)
                tz_all = z @ K + B
            tz_list = [
                tz_all[..., i * self.d_hidden : (i + 1) * self.d_hidden]
                for i in range(len(p["lin_z"]))
            ]
            if self.use_spade:
                Ks = jnp.concatenate([k for k, _ in p["scale_z"]], axis=1).astype(dt)
                Bs = jnp.concatenate([b for _, b in p["scale_z"]]).astype(dt)
                sz_all = z @ Ks + Bs
                sz_list = [
                    sz_all[..., i * self.d_hidden : (i + 1) * self.d_hidden]
                    for i in range(len(p["scale_z"]))
                ]

        if self.d_in > 0:
            x = dense(x, p["lin_in"])
        else:
            x = jnp.zeros(z.shape[:-1] + (self.d_hidden,), dtype=dt)

        for blkid in range(self.n_blocks):
            if blkid == self.combine_layer:
                x = combine_interleaved(
                    x.reshape(-1, x.shape[-1]), combine_inner_dims, self.combine_type
                )
                tz_list = sz_list = None  # latent injected only before fusion

            if tz_list is not None and blkid < self.combine_layer:
                if sz_list is not None:
                    x = sz_list[blkid] * x + tz_list[blkid]
                else:
                    x = x + tz_list[blkid]

            k0, b0, k1, b1 = p["blocks"][blkid]
            net = dense(act(x), (k0, b0))
            x = x + dense(act(net), (k1, b1))

        out = dense(act(x), p["lin_out"])
        return out.astype(jnp.float32)

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
            dtype=jnp.dtype(conf.get_string("dtype", "float32")),
            **kwargs,
        )
