"""Transfuser sensor-fusion backbone (camera + lidar-BEV, GPT token fusion).

Parity: `navsim/agents/diffusiondrive/transfuser_backbone.py`. Two ResNet
branches run stage-by-stage; after each stage both feature maps are pooled to
fixed token grids (8x32 image, 8x8 lidar), jointly self-attended by a small
GPT (2 layers), projected back, bilinearly upsampled and residually added.
The lidar branch's final 8x8x512 map is both the transformer-decoder memory
and the FPN input producing the 64x64x64 BEV feature for the diffusion
decoder's grid-sample attention.

TPU design notes: NHWC throughout; the pooled fusion token count is a fixed
320 per stage, so the whole backbone is static-shaped and fuses into one XLA
program. Convs hit the MXU; adaptive pools are reshape-means.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

import jax

from diffusiondrive_tpu.models.config import TransfuserConfig
from diffusiondrive_tpu.models.resnet import ARCH_SPECS, ResNetStage, ResNetStem
from diffusiondrive_tpu.ops.attention_fused import (
    dropout_keep_mask, fused_attention, supports_fused_attention)
from diffusiondrive_tpu.ops.sampling import adaptive_avg_pool2d, resize_bilinear


class GPTSelfAttention(nn.Module):
    """Fused-token self-attention (`transfuser_backbone.py:365-409`).

    A fused Pallas kernel for the score/softmax/dropout/value chain exists
    (`ops/attention_fused.py`) but measured SLOWER than XLA's fusion at the
    fusion-block shape (B=64, H=4, T=320, D=64: fwd 1.14-1.43 vs ~1.0 ms,
    fwd+bwd 1.50 vs 1.28 ms; docs/profiling.md round-5 A/B), so
    `fused_mode="auto"` resolves to the XLA einsum path; "on" forces the
    kernel on TPU, "interpret" runs it on CPU for tests. The fused path's
    attention dropout draws its keep mask from the same "dropout" RNG
    stream via threefry (mask values differ from `nn.Dropout`'s draw, the
    distribution and determinism guarantees are identical).
    """

    n_embd: int
    n_head: int
    attn_pdrop: float
    resid_pdrop: float
    dtype: Any = jnp.float32
    fused_mode: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, T, C = x.shape
        d_head = C // self.n_head

        def split(t):
            return t.reshape(B, T, self.n_head, d_head).transpose(0, 2, 1, 3)

        init = nn.initializers.normal(stddev=0.02)
        q = split(nn.Dense(C, dtype=self.dtype, kernel_init=init, name="query")(x))
        k = split(nn.Dense(C, dtype=self.dtype, kernel_init=init, name="key")(x))
        v = split(nn.Dense(C, dtype=self.dtype, kernel_init=init, name="value")(x))

        fused = supports_fused_attention(T, d_head) and (
            self.fused_mode == "interpret"
            or (self.fused_mode == "on" and jax.default_backend() == "tpu")
        )
        if fused:
            pdrop = 0.0 if deterministic else float(self.attn_pdrop)
            mask = None
            if pdrop > 0.0:
                mask = dropout_keep_mask(
                    self.make_rng("dropout"), (B, self.n_head, T, T), pdrop)
            y = fused_attention(q, k, v, mask, pdrop,
                                self.fused_mode == "interpret")
        else:
            att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
                jnp.float32(d_head)).astype(x.dtype)
            att = nn.softmax(att, axis=-1)
            # explicit names keep the resid dropout's RNG path identical
            # whether or not the attn Dropout module is constructed
            att = nn.Dropout(self.attn_pdrop, deterministic=deterministic,
                             name="attn_drop")(att)
            y = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        y = y.transpose(0, 2, 1, 3).reshape(B, T, C)
        y = nn.Dense(C, dtype=self.dtype, kernel_init=init, name="proj")(y)
        return nn.Dropout(self.resid_pdrop, deterministic=deterministic,
                          name="resid_drop")(y)


class GPTBlock(nn.Module):
    """Pre-LN transformer block with ReLU MLP (`transfuser_backbone.py:412-431`)."""

    n_embd: int
    n_head: int
    block_exp: int
    attn_pdrop: float
    resid_pdrop: float
    dtype: Any = jnp.float32
    fused_mode: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        init = nn.initializers.normal(stddev=0.02)
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        x = x + GPTSelfAttention(self.n_embd, self.n_head, self.attn_pdrop, self.resid_pdrop,
                                 self.dtype, self.fused_mode, name="attn")(h, deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.block_exp * self.n_embd, dtype=self.dtype, kernel_init=init,
                     name="mlp_fc1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.n_embd, dtype=self.dtype, kernel_init=init, name="mlp_fc2")(h)
        h = nn.Dropout(self.resid_pdrop, deterministic=deterministic)(h)
        return x + h


class GPTFusion(nn.Module):
    """Joint image+lidar token transformer for one backbone stage
    (`transfuser_backbone.py:279-362`)."""

    n_embd: int
    config: TransfuserConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, image_tokens: jnp.ndarray, lidar_tokens: jnp.ndarray, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """image_tokens (B, 8, 32, C), lidar_tokens (B, 8, 8, C) -> same shapes."""
        cfg = self.config
        B, ih, iw, C = image_tokens.shape
        _, lh, lw, _ = lidar_tokens.shape
        n_img = cfg.img_vert_anchors * cfg.img_horz_anchors
        n_lidar = cfg.lidar_vert_anchors * cfg.lidar_horz_anchors

        tokens = jnp.concatenate(
            [image_tokens.reshape(B, n_img, C), lidar_tokens.reshape(B, n_lidar, C)], axis=1
        )
        pos_emb = self.param("pos_emb", nn.initializers.zeros, (1, n_img + n_lidar, self.n_embd))
        x = nn.Dropout(cfg.embd_pdrop, deterministic=deterministic)(tokens + pos_emb.astype(tokens.dtype))
        for i in range(cfg.n_layer):
            x = GPTBlock(self.n_embd, cfg.n_head, cfg.block_exp, cfg.attn_pdrop, cfg.resid_pdrop,
                         self.dtype, getattr(cfg, "fused_attention_mode", "auto"),
                         name=f"block{i}")(x, deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_f")(x)

        return x[:, :n_img].reshape(B, ih, iw, C), x[:, n_img:].reshape(B, lh, lw, C)


class TransfuserBackbone(nn.Module):
    """Interleaved two-branch ResNet with per-stage GPT fusion + BEV FPN."""

    config: TransfuserConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, camera: jnp.ndarray, lidar: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """
        :param camera: (B, 256, 1024, 3) stitched front image
        :param lidar: (B, 256, 256, lidar_in_channels) BEV histogram
        :return: (bev_feature_upscale (B, 64, 64, 64), bev_feature (B, 8, 8, 512))
        """
        cfg = self.config
        deterministic = not train
        img_block, img_sizes, img_widths, img_chs = ARCH_SPECS[cfg.image_architecture]
        lid_block, lid_sizes, lid_widths, lid_chs = ARCH_SPECS[cfg.lidar_architecture]

        fused_mode = getattr(cfg, "fused_conv_mode", "auto")
        img = ResNetStem(dtype=self.dtype, fused_mode=fused_mode,
                         name="image_encoder_stem")(camera, train=train)
        lid = ResNetStem(dtype=self.dtype, fused_mode=fused_mode,
                         name="lidar_encoder_stem")(lidar, train=train)
        for i in range(4):
            img = ResNetStage(img_widths[i], img_sizes[i], stride=1 if i == 0 else 2,
                              block=img_block, dtype=self.dtype, fused_mode=fused_mode,
                              name=f"image_encoder_layer{i + 1}")(img, train=train)
            lid = ResNetStage(lid_widths[i], lid_sizes[i], stride=1 if i == 0 else 2,
                              block=lid_block, dtype=self.dtype, fused_mode=fused_mode,
                              name=f"lidar_encoder_layer{i + 1}")(lid, train=train)

            img_tokens = adaptive_avg_pool2d(img, (cfg.img_vert_anchors, cfg.img_horz_anchors))
            lid_tokens = adaptive_avg_pool2d(lid, (cfg.lidar_vert_anchors, cfg.lidar_horz_anchors))
            # lidar channels -> image channels for the joint transformer
            lid_tokens = nn.Conv(img_chs[i], (1, 1), dtype=self.dtype,
                                 name=f"lidar_to_img{i}")(lid_tokens)

            img_out, lid_out = GPTFusion(img_chs[i], cfg, dtype=self.dtype,
                                         name=f"fusion{i}")(img_tokens, lid_tokens, deterministic)

            lid_out = nn.Conv(lid_chs[i], (1, 1), dtype=self.dtype,
                              name=f"img_to_lidar{i}")(lid_out)
            img = img + resize_bilinear(img_out, img.shape[1:3])
            lid = lid + resize_bilinear(lid_out, lid.shape[1:3])

        bev_feature = lid  # (B, 8, 8, C4)

        # FPN top-down (`transfuser_backbone.py:153-159`)
        channel = cfg.bev_features_channels
        p5 = nn.relu(nn.Conv(channel, (1, 1), dtype=self.dtype, name="c5_conv")(bev_feature))
        p5_up = resize_bilinear(p5, (p5.shape[1] * cfg.bev_upsample_factor,
                                     p5.shape[2] * cfg.bev_upsample_factor))
        p4 = nn.relu(nn.Conv(channel, (3, 3), padding=1, dtype=self.dtype, name="up_conv5")(p5_up))
        target = (cfg.lidar_resolution_height // cfg.bev_down_sample_factor,
                  cfg.lidar_resolution_width // cfg.bev_down_sample_factor)
        p4_up = resize_bilinear(p4, target)
        p3 = nn.relu(nn.Conv(channel, (3, 3), padding=1, dtype=self.dtype, name="up_conv4")(p4_up))

        return p3, bev_feature
