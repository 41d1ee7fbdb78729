"""ResNet-18/34 backbone in Flax, structurally compatible with torchvision.

The reference conditions the field on a torchvision ResNet34 truncated to its
first stages (src/model/encoder.py:62-68, 130-148). We rebuild the same
computation TPU-first: NHWC layout, XLA convolutions, BatchNorm with running
statistics (torch momentum 0.1 == flax momentum 0.9, eps 1e-5).

Module/parameter naming mirrors torchvision state_dict keys
(``conv1 / bn1 / layer{k} -> block{j} -> conv1 ...``) so the checkpoint
importer (torch_import.py) is a mechanical key map.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.9  # torch momentum 0.1
BN_EPS = 1e-5


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch ``MaxPool2d(kernel_size=3, stride=2, padding=1)`` in NHWC."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _conv(features: int, kernel: int, stride: int, name: str,
          dtype: Any = jnp.float32) -> nn.Conv:
    """torch-style Conv2d(kernel, stride, padding=kernel//2, bias=False)."""
    pad = kernel // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        dtype=dtype,
        name=name,
    )


def _bn(train: bool, name: str, dtype: Any = jnp.float32) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3 -> 3x3 with identity/projection shortcut."""

    features: int
    stride: int = 1
    use_projection: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        identity = x
        y = _conv(self.features, 3, self.stride, "conv1", self.dtype)(x)
        y = _bn(train, "bn1", self.dtype)(y)
        y = nn.relu(y)
        y = _conv(self.features, 3, 1, "conv2", self.dtype)(y)
        y = _bn(train, "bn2", self.dtype)(y)
        if self.use_projection:
            identity = _conv(self.features, 1, self.stride, "downsample_conv",
                             self.dtype)(x)
            identity = _bn(train, "downsample_bn", self.dtype)(identity)
        return nn.relu(y + identity)


STAGE_SIZES = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3)}
STAGE_FEATURES = (64, 128, 256, 512)


class ResNetStage(nn.Module):
    features: int
    num_blocks: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for j in range(self.num_blocks):
            stride = self.stride if j == 0 else 1
            use_projection = j == 0 and (
                stride != 1 or x.shape[-1] != self.features
            )
            x = BasicBlock(
                self.features, stride, use_projection, dtype=self.dtype,
                name=f"block{j}",
            )(x, train)
        return x


class ResNetFeatures(nn.Module):
    """Truncated ResNet trunk returning per-stage feature maps.

    Returns ``num_layers`` feature maps: [post-stem, layer1, ..., layer{n-1}]
    exactly as the reference consumes them (encoder.py:130-148).
    ``use_first_pool=False`` skips the stem maxpool (sn64 config).
    """

    backbone: str = "resnet34"
    num_layers: int = 4
    use_first_pool: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Sequence[jax.Array]:
        sizes = STAGE_SIZES[self.backbone]
        dt = self.dtype
        x = _conv(64, 7, 2, "conv1", dt)(x.astype(dt))
        x = _bn(train, "bn1", dt)(x)
        x = nn.relu(x)
        latents = [x]
        if self.num_layers > 1:
            if self.use_first_pool:
                x = max_pool_3x3_s2(x)
            x = ResNetStage(STAGE_FEATURES[0], sizes[0], 1, dtype=dt, name="layer1")(x, train)
            latents.append(x)
        if self.num_layers > 2:
            x = ResNetStage(STAGE_FEATURES[1], sizes[1], 2, dtype=dt, name="layer2")(x, train)
            latents.append(x)
        if self.num_layers > 3:
            x = ResNetStage(STAGE_FEATURES[2], sizes[2], 2, dtype=dt, name="layer3")(x, train)
            latents.append(x)
        if self.num_layers > 4:
            x = ResNetStage(STAGE_FEATURES[3], sizes[3], 2, dtype=dt, name="layer4")(x, train)
            latents.append(x)
        return [l.astype(jnp.float32) for l in latents]


class ResNetTrunk(nn.Module):
    """Full ResNet trunk through layer4 + global average pool (for the
    global ImageEncoder; reference encoder.py:209-233)."""

    backbone: str = "resnet34"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        sizes = STAGE_SIZES[self.backbone]
        x = _conv(64, 7, 2, "conv1")(x)
        x = _bn(train, "bn1")(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)
        for i, (feat, n) in enumerate(zip(STAGE_FEATURES, sizes)):
            x = ResNetStage(feat, n, 1 if i == 0 else 2, name=f"layer{i + 1}")(x, train)
        return jnp.mean(x, axis=(1, 2))  # (N, 512)
