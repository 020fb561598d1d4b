"""Flax ResNet feature extractors, decomposed into stem + stages.

Replaces the timm `resnet34(features_only=True)` encoders used by the
Transfuser backbone (`transfuser_backbone.py:24-55`). The stem and stages are
separate modules because the backbone interleaves sensor-fusion transformers
*between* ResNet stages (`transfuser_backbone.py:188-195`). NHWC layout.

Weight porting: param names mirror the torch module tree (conv1/bn1/layerN_M)
so `utils/port_weights.py` can map a timm checkpoint 1:1.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax.numpy as jnp

_BN = dict(momentum=0.9, epsilon=1e-5)


class BasicBlock(nn.Module):
    """Two 3x3 convs with identity/downsample residual (torchvision BasicBlock)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1", **_BN)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2", **_BN)(y)

        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                    name="downsample_bn", **_BN)(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1-3x3-1x1 bottleneck (torchvision), for the nuScenes ResNet-50 variant."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        out_features = self.features * 4
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1", **_BN)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2", **_BN)(y)
        y = nn.relu(y)
        y = nn.Conv(out_features, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn3", **_BN)(y)

        if residual.shape[-1] != out_features or self.stride != 1:
            residual = nn.Conv(out_features, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                    name="downsample_bn", **_BN)(residual)
        return nn.relu(y + residual)


class ResNetStem(nn.Module):
    """conv7x7/2 + BN + ReLU + maxpool3x3/2 (overall reduction 4)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1", **_BN)(x)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class ResNetStage(nn.Module):
    """A stack of residual blocks; first block downsamples when `stride` > 1."""

    features: int
    num_blocks: int
    stride: int = 1
    block: str = "basic"  # "basic" | "bottleneck"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        for block_idx in range(self.num_blocks):
            x = block_cls(self.features, stride=self.stride if block_idx == 0 else 1,
                          dtype=self.dtype, name=f"block{block_idx}")(x, train=train)
        return x


ARCH_SPECS = {
    # name: (block, stage_sizes, stage_widths, out_channels)
    "resnet18": ("basic", (2, 2, 2, 2), (64, 128, 256, 512), (64, 128, 256, 512)),
    "resnet34": ("basic", (3, 4, 6, 3), (64, 128, 256, 512), (64, 128, 256, 512)),
    "resnet50": ("bottleneck", (3, 4, 6, 3), (64, 128, 256, 512), (256, 512, 1024, 2048)),
}


def feature_channels(name: str) -> Sequence[int]:
    """Per-stage output channels at reductions (4, 8, 16, 32)."""
    return ARCH_SPECS[name][3]


class ResNetFeatures(nn.Module):
    """Full feature pyramid: returns the 4 stage outputs (reductions 4/8/16/32)."""

    architecture: str = "resnet34"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        block, sizes, widths, _ = ARCH_SPECS[self.architecture]
        x = ResNetStem(dtype=self.dtype, name="stem")(x, train=train)
        features = []
        for stage_idx, (num_blocks, width) in enumerate(zip(sizes, widths)):
            x = ResNetStage(width, num_blocks, stride=1 if stage_idx == 0 else 2, block=block,
                            dtype=self.dtype, name=f"layer{stage_idx + 1}")(x, train=train)
            features.append(x)
        return features
