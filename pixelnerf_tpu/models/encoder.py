"""Image encoders: pixel-aligned spatial CNN, global CNN, and the
experimental U-Net-ish ConvEncoder (reference src/model/encoder.py,
src/model/custom_encoder.py), rebuilt NHWC/XLA-first.

Functional-core difference from the reference: ``forward`` *returns* the
latent instead of caching it in a module buffer, and pixel-aligned lookup is
the free function :func:`index_latent` on that returned array — no hidden
state, so everything jits/vmaps/shards trivially.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.grid_sample import grid_sample
from ..ops.resize import resize_area, resize_bilinear
from .resnet import ResNetFeatures, ResNetTrunk


def latent_scaling(latent_h: int, latent_w: int) -> jnp.ndarray:
    """Pixel->grid scaling constants, (2,) [sx, sy].

    Matches reference encoder.py:161-163: ``s = size/(size-1) * 2`` per axis,
    the align_corners=True convention relating original-image pixel coords to
    the latent's [-1, 1] grid coords.
    """
    return jnp.array(
        [
            latent_w / (latent_w - 1) * 2.0,
            latent_h / (latent_h - 1) * 2.0,
        ],
        dtype=jnp.float32,
    )


def index_latent(
    latent: jax.Array,
    uv: jax.Array,
    image_shape: Optional[jax.Array] = None,
    interp: str = "bilinear",
    padding: str = "border",
) -> jax.Array:
    """Pixel-aligned feature lookup (reference SpatialEncoder.index).

    :param latent: (B, Hl, Wl, C) encoder output
    :param uv: (B, N, 2) query points — (x, y) in *original image* pixel
        coordinates if ``image_shape`` given, else already in [-1, 1]
    :param image_shape: (2,) [W, H] of the original image, or None
    :return: (B, N, C) features
    """
    if image_shape is not None:
        scale = latent_scaling(latent.shape[1], latent.shape[2]) / image_shape
        uv = uv * scale - 1.0
    return grid_sample(latent, uv, mode=interp, padding_mode=padding, align_corners=True)


class SpatialEncoder(nn.Module):
    """Pixel-aligned CNN encoder: truncated ResNet, multi-scale concat.

    Each stage's feature map is bilinearly upsampled (align_corners=True) to
    the first stage's resolution and channel-concatenated, giving a
    (B, H', W', latent_size) map; latent_size = 512 for num_layers=4
    (64+64+128+256). Reference encoder.py:13-164.
    """

    backbone: str = "resnet34"
    num_layers: int = 4
    use_first_pool: bool = True
    upsample_interp: str = "bilinear"
    index_interp: str = "bilinear"
    index_padding: str = "border"
    feature_scale: float = 1.0
    dtype: Any = jnp.float32

    @property
    def latent_size(self) -> int:
        if self.backbone == "custom":
            return 128
        return [0, 64, 128, 256, 512, 1024][self.num_layers]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """:param x: (B, H, W, 3) images normalized to [-1, 1]
        :return: (B, H', W', latent_size)"""
        if self.feature_scale != 1.0:
            h = int(round(x.shape[1] * self.feature_scale))
            w = int(round(x.shape[2] * self.feature_scale))
            if self.feature_scale > 1.0:
                x = resize_bilinear(x, h, w, align_corners=True)
            else:
                x = resize_area(x, h, w)
        if self.backbone == "custom":
            return ConvEncoder(name="model")(x)
        latents = ResNetFeatures(
            backbone=self.backbone,
            num_layers=self.num_layers,
            use_first_pool=self.use_first_pool,
            dtype=self.dtype,
            name="model",
        )(x, train)
        target_h, target_w = latents[0].shape[1:3]
        align = self.index_interp != "nearest "
        latents = [
            resize_bilinear(lat, target_h, target_w, align_corners=align)
            for lat in latents
        ]
        return jnp.concatenate(latents, axis=-1)

    def index(
        self, latent: jax.Array, uv: jax.Array, image_shape=None
    ) -> jax.Array:
        return index_latent(
            latent, uv, image_shape, self.index_interp, self.index_padding
        )

    @classmethod
    def from_conf(cls, conf) -> "SpatialEncoder":
        return cls(
            backbone=conf.get_string("backbone", "resnet34"),
            num_layers=conf.get_int("num_layers", 4),
            use_first_pool=conf.get_bool("use_first_pool", True),
            upsample_interp=conf.get_string("upsample_interp", "bilinear"),
            index_interp=conf.get_string("index_interp", "bilinear"),
            index_padding=conf.get_string("index_padding", "border"),
            feature_scale=conf.get_float("feature_scale", 1.0),
            dtype=jnp.dtype(conf.get_string("dtype", "float32")),
        )


class ImageEncoder(nn.Module):
    """Global image encoder: full ResNet trunk + avgpool -> (B, latent_size).

    Reference encoder.py:180-241. Its ``index`` is a broadcast of the global
    vector per query point.
    """

    backbone: str = "resnet34"
    latent_size: int = 128

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        z = ResNetTrunk(backbone=self.backbone, name="model")(x, train)
        if self.latent_size != 512:
            z = nn.Dense(self.latent_size, name="fc")(z)
        return z

    @staticmethod
    def index(latent: jax.Array, n_queries: int) -> jax.Array:
        """(B, L) -> (B, n_queries, L) broadcast of the global vector per
        query point (reference encoder.py:201-207, whose ``index(uv, ...)``
        likewise ignores everything about uv except the query count)."""
        return jnp.broadcast_to(
            latent[:, None, :], (latent.shape[0], n_queries, latent.shape[1])
        )

    @classmethod
    def from_conf(cls, conf) -> "ImageEncoder":
        return cls(
            backbone=conf.get_string("backbone", "resnet34"),
            latent_size=conf.get_int("latent_size", 128),
        )


def _same_pad(x: jax.Array, kernel: int, stride: int, mode: str = "reflect") -> jax.Array:
    """TensorFlow-SAME padding before a VALID conv (reference util.py:400-435)."""
    h, w = x.shape[1:3]
    out_h = -(-h // stride)
    out_w = -(-w // stride)
    pad_h = max((out_h - 1) * stride + kernel - h, 0)
    pad_w = max((out_w - 1) * stride + kernel - w, 0)
    pads = (
        (0, 0),
        (pad_h // 2, pad_h - pad_h // 2),
        (pad_w // 2, pad_w - pad_w // 2),
        (0, 0),
    )
    return jnp.pad(x, pads, mode=mode)


def _same_unpad_deconv(x: jax.Array, kernel: int, stride: int) -> jax.Array:
    """Crop after a transposed conv (reference util.py:438-458)."""
    h_scaled = (x.shape[1] - 1) * stride
    w_scaled = (x.shape[2] - 1) * stride
    out_h = -(-h_scaled // stride)
    out_w = -(-w_scaled // stride)
    pad_h = max((out_h - 1) * stride + kernel - h_scaled, 0)
    pad_w = max((out_w - 1) * stride + kernel - w_scaled, 0)
    top, bottom = pad_h // 2, pad_h - pad_h // 2
    left, right = pad_w // 2, pad_w - pad_w // 2
    return x[:, top : x.shape[1] - bottom, left : x.shape[2] - right, :]


class ConvEncoder(nn.Module):
    """Experimental 3-down/3-up conv encoder with skip concats
    (reference src/model/custom_encoder.py; selected by backbone='custom')."""

    dim_in: int = 3
    first_layer_chnls: int = 64
    mid_layer_chnls: int = 128
    last_layer_chnls: int = 128
    n_down_layers: int = 3
    group_norm_groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = nn.leaky_relu

        def conv_block(y, feats, kernel, stride, name):
            y = _same_pad(y, kernel, stride)
            y = nn.Conv(
                feats, (kernel, kernel), strides=stride, padding="VALID",
                use_bias=False, name=f"{name}_conv",
            )(y)
            y = nn.GroupNorm(num_groups=self.group_norm_groups, name=f"{name}_norm")(y)
            return act(y)

        x = conv_block(x, self.first_layer_chnls, 7, 2, "conv_in")
        inters = []
        chnls = self.first_layer_chnls
        for i in range(self.n_down_layers):
            x = conv_block(x, 2 * chnls, 3, 2, f"conv{i}")
            inters.append(x)
            chnls *= 2
        x = conv_block(x, self.mid_layer_chnls, 4, 4, "conv_mid")
        # Collapse remaining spatial extent into channels, broadcast back out.
        x = x.reshape(x.shape[0], 1, 1, -1)
        x = jnp.broadcast_to(
            x, (x.shape[0],) + inters[-1].shape[1:3] + (x.shape[-1],)
        )
        for i in reversed(range(self.n_down_layers)):
            x = jnp.concatenate([x, inters[i]], axis=-1)
            feats = self.first_layer_chnls * (2**i)
            x = nn.ConvTranspose(
                feats, (3, 3), strides=(2, 2), padding="VALID",
                use_bias=False, name=f"deconv{i}_conv",
            )(x)
            x = _same_unpad_deconv(x, 3, 2)
            x = nn.GroupNorm(num_groups=self.group_norm_groups, name=f"deconv{i}_norm")(x)
            x = act(x)
        x = nn.ConvTranspose(
            self.last_layer_chnls, (3, 3), strides=(2, 2), padding="VALID",
            use_bias=True, name="deconv_last",
        )(x)
        return _same_unpad_deconv(x, 3, 2)
