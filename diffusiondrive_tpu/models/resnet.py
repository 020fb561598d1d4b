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
import jax
import jax.numpy as jnp

from diffusiondrive_tpu.ops.conv_fused import (
    bn_eval_affine,
    conv3x3_train,
    fused_conv3x3_packed,
    maxpool3x3s2,
    pack_pairs,
    supports_fused_conv3x3,
    unpack_pairs,
)
from diffusiondrive_tpu.ops.stem_fused import fused_stem, supports_fused_stem

_BN = dict(momentum=0.9, epsilon=1e-5)


class Conv3x3(nn.Module):
    """Param-compatible stand-in for ``nn.Conv(features, (3, 3), padding=1,
    use_bias=False)`` that exposes its kernel (setup-style) so the fused
    eval path can read it without running the conv."""

    features: int
    in_features: int
    stride: int = 1
    dtype: Any = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), self.kernel.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BasicBlock(nn.Module):
    """Two 3x3 convs with identity/downsample residual (torchvision BasicBlock).

    Eval path on TPU: both convs run as one fused Pallas kernel each
    (`ops/conv_fused.py`) with the eval-mode BatchNorm folded to an exact
    per-channel affine, the residual add and the ReLU fused in — the 64ch
    3x3 convs of layer1 otherwise cap at 28% MFU under XLA's conv emitter.
    `fused_mode`: "auto" (eval fusion, TPU only), "off", "interpret" (CPU
    tests; also exercises the train-path kernel), or "train" (opt-in
    train-path Pallas convs — measured slower at b64, see below).
    """

    features: int
    stride: int = 1
    dtype: Any = jnp.float32
    fused_mode: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 packed: bool = False) -> jnp.ndarray:
        """`packed=True`: `x` is width-paired (B,H,W//2,128) and the output
        stays packed — the fused eval path chains whole stages in that layout
        (each pack/unpack relayout costs ~as much as half a kernel)."""
        conv1 = Conv3x3(self.features, 64 if packed else x.shape[-1],
                        self.stride, dtype=self.dtype, name="conv1")
        bn1 = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="bn1", **_BN)
        conv2 = Conv3x3(self.features, self.features, dtype=self.dtype, name="conv2")
        bn2 = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="bn2", **_BN)

        fused = packed or (
            not train
            and self.fused_mode != "off"
            and supports_fused_conv3x3(x, self.features, self.stride)
            and (self.fused_mode == "interpret" or jax.default_backend() == "tpu")
        )
        if fused:
            interp = self.fused_mode == "interpret"
            s1, b1 = bn_eval_affine(bn1, self.features, self.dtype)
            s2, b2 = bn_eval_affine(bn2, self.features, self.dtype)
            x2 = x if packed else pack_pairs(x.astype(self.dtype))
            y2 = fused_conv3x3_packed(x2, conv1.kernel.astype(self.dtype),
                                      s1, b1, relu=True, interpret=interp)
            out2 = fused_conv3x3_packed(y2, conv2.kernel.astype(self.dtype),
                                        s2, b2, residual2=x2, relu=True,
                                        interpret=interp)
            return out2 if packed else unpack_pairs(out2)

        # Train-path Pallas convs (`ops/conv_fused.py:conv3x3_train`) are
        # opt-in (`fused_mode="train"`), NOT part of "auto": measured at b64
        # on v5e the full train step REGRESSED 182 -> 239 ms device. The
        # kernel itself wins 3x (0.44 vs 1.4 ms/conv), but every elementwise
        # op XLA fuses across the packed<->NHWC reshape at the custom-call
        # boundary runs at ~1/8 bandwidth (ReLU 4-5 ms, BN casts 2-3 ms,
        # backward repacks 3.1 ms/block) — docs/profiling.md round 5.
        # "interpret" keeps the path exercised by CPU parity tests.
        pallas_train = (
            train
            and supports_fused_conv3x3(x, self.features, self.stride)
            and (self.fused_mode == "interpret"
                 or (self.fused_mode == "train"
                     and jax.default_backend() == "tpu"))
        )
        if pallas_train:
            interp = self.fused_mode == "interpret"
            do_conv1 = lambda v: conv3x3_train(
                v.astype(self.dtype), conv1.kernel.astype(self.dtype), interp)
            do_conv2 = lambda v: conv3x3_train(
                v.astype(self.dtype), conv2.kernel.astype(self.dtype), interp)
        else:
            do_conv1, do_conv2 = conv1, conv2

        residual = x
        y = do_conv1(x)
        y = bn1(y)
        y = nn.relu(y)
        y = do_conv2(y)
        y = bn2(y)

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


class Conv7x7(nn.Module):
    """Param-compatible stand-in for ``nn.Conv(64, (7, 7), strides=2,
    padding=3, use_bias=False)`` that exposes its kernel (setup-style) so the
    fused stem kernel can read it without running the conv."""

    features: int
    in_features: int
    dtype: Any = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, self.in_features, self.features))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), self.kernel.astype(self.dtype),
            window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNetStem(nn.Module):
    """conv7x7/2 + BN + ReLU + maxpool3x3/2 (overall reduction 4).

    Eval path on TPU: the whole stem runs as one fused Pallas kernel
    (`ops/stem_fused.py`) with the eval BatchNorm folded to an affine — a
    3-channel NHWC conv caps XLA's emitter at ~7% MFU and the pool's
    reduce_window adds ~0.5 ms; fused they cost one VMEM pass.
    """

    dtype: Any = jnp.float32
    fused_mode: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv1 = Conv7x7(64, x.shape[-1], dtype=self.dtype, name="conv1")
        bn1 = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="bn1", **_BN)
        fused = (
            not train
            and self.fused_mode != "off"
            and supports_fused_stem(x)
            and (self.fused_mode == "interpret" or jax.default_backend() == "tpu")
        )
        if fused:
            s1, b1 = bn_eval_affine(bn1, 64, self.dtype)
            return fused_stem(x.astype(self.dtype), conv1.kernel.astype(self.dtype),
                              s1, b1, interpret=self.fused_mode == "interpret")
        x = conv1(x)
        x = bn1(x)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class ResNetStage(nn.Module):
    """A stack of residual blocks; first block downsamples when `stride` > 1."""

    features: int
    num_blocks: int
    stride: int = 1
    block: str = "basic"  # "basic" | "bottleneck"
    dtype: Any = jnp.float32
    fused_mode: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # Fused eval path: when every block of the stage is kernel-eligible
        # (64ch basic blocks, stride 1 — i.e. layer1), chain the whole stage
        # in the width-paired layout: one pack/unpack relayout total instead
        # of two per conv.
        fused_stage = (
            self.block == "basic"
            and not train
            and self.fused_mode != "off"
            and self.stride == 1
            and supports_fused_conv3x3(x, self.features, self.stride)
            and (self.fused_mode == "interpret" or jax.default_backend() == "tpu")
        )
        if fused_stage:
            x = pack_pairs(x.astype(self.dtype))
        for block_idx in range(self.num_blocks):
            stride = self.stride if block_idx == 0 else 1
            if self.block == "basic":
                x = BasicBlock(self.features, stride=stride, dtype=self.dtype,
                               fused_mode=self.fused_mode,
                               name=f"block{block_idx}")(
                    x, train=train, packed=fused_stage)
            else:
                x = Bottleneck(self.features, stride=stride, dtype=self.dtype,
                               name=f"block{block_idx}")(x, train=train)
        if fused_stage:
            x = unpack_pairs(x)
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
    fused_mode: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        block, sizes, widths, _ = ARCH_SPECS[self.architecture]
        x = ResNetStem(dtype=self.dtype, fused_mode=self.fused_mode,
                       name="stem")(x, train=train)
        features = []
        for stage_idx, (num_blocks, width) in enumerate(zip(sizes, widths)):
            x = ResNetStage(width, num_blocks, stride=1 if stage_idx == 0 else 2, block=block,
                            dtype=self.dtype, fused_mode=self.fused_mode,
                            name=f"layer{stage_idx + 1}")(x, train=train)
            features.append(x)
        return features
