"""Conditional 1D UNet with FiLM conditioning (diffusion-policy ablation).

Parity: `navsim/agents/diffusiondrive/modules/conditional_unet1d.py` — the
vanilla diffusion-policy denoiser kept by the reference for the 20-step DDIM
ablation (SURVEY §2.5). Sequence-last-channel (B, T, C) layout; FiLM
scale/shift from the timestep embedding (+ optional global conditioning).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from diffusiondrive_tpu.models.layers import mish
from diffusiondrive_tpu.ops.embed import sinusoidal_pos_emb


class Conv1dBlock(nn.Module):
    """Conv1d -> GroupNorm -> Mish."""

    features: int
    kernel_size: int = 3
    n_groups: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features, (self.kernel_size,), padding=self.kernel_size // 2,
                    dtype=self.dtype, name="conv")(x)
        # torch GroupNorm eps (flax defaults to 1e-6)
        x = nn.GroupNorm(num_groups=self.n_groups, epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return mish(x)


class ConditionalResidualBlock1D(nn.Module):
    """Two conv blocks with FiLM conditioning + 1x1 residual."""

    features: int
    cond_predict_scale: bool = False
    kernel_size: int = 3
    n_groups: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        out = Conv1dBlock(self.features, self.kernel_size, self.n_groups, self.dtype, name="block0")(x)
        cond_channels = self.features * 2 if self.cond_predict_scale else self.features
        embed = nn.Dense(cond_channels, dtype=self.dtype, name="cond_fc")(mish(cond))[:, None, :]
        if self.cond_predict_scale:
            scale, bias = jnp.split(embed, 2, axis=-1)
            out = out * scale + bias
        else:
            out = out + embed
        out = Conv1dBlock(self.features, self.kernel_size, self.n_groups, self.dtype, name="block1")(out)
        residual = x
        if x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1,), dtype=self.dtype, name="residual_conv")(x)
        return out + residual


class ConditionalUnet1D(nn.Module):
    """(B, T, input_dim) noisy sequence + timestep [+ global cond] -> denoised."""

    input_dim: int
    global_cond_dim: Optional[int] = None
    diffusion_step_embed_dim: int = 256
    down_dims: Sequence[int] = (256, 512, 1024)
    kernel_size: int = 3
    n_groups: int = 8
    cond_predict_scale: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, sample: jnp.ndarray, timesteps: jnp.ndarray, global_cond: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        dsed = self.diffusion_step_embed_dim
        t_embed = sinusoidal_pos_emb(jnp.broadcast_to(jnp.atleast_1d(timesteps), (sample.shape[0],)), dsed)
        t_embed = nn.Dense(dsed * 4, dtype=self.dtype, name="time_fc1")(t_embed)
        t_embed = nn.Dense(dsed, dtype=self.dtype, name="time_fc2")(mish(t_embed))
        cond = t_embed if global_cond is None else jnp.concatenate([t_embed, global_cond], axis=-1)

        dims = list(self.down_dims)
        blk = dict(cond_predict_scale=self.cond_predict_scale, kernel_size=self.kernel_size,
                   n_groups=self.n_groups, dtype=self.dtype)

        x = sample
        skips = []
        for i, dim in enumerate(dims):
            x = ConditionalResidualBlock1D(dim, name=f"down{i}_res0", **blk)(x, cond)
            x = ConditionalResidualBlock1D(dim, name=f"down{i}_res1", **blk)(x, cond)
            skips.append(x)
            if i < len(dims) - 1:
                x = nn.Conv(dim, (3,), strides=(2,), padding=1, dtype=self.dtype, name=f"down{i}_ds")(x)

        x = ConditionalResidualBlock1D(dims[-1], name="mid_res0", **blk)(x, cond)
        x = ConditionalResidualBlock1D(dims[-1], name="mid_res1", **blk)(x, cond)

        for i, dim in enumerate(reversed(dims[:-1])):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ConditionalResidualBlock1D(dim, name=f"up{i}_res0", **blk)(x, cond)
            x = ConditionalResidualBlock1D(dim, name=f"up{i}_res1", **blk)(x, cond)
            # torch ConvTranspose1d(k=4, s=2, p=1) == flax padding (k-1-p, k-1-p) = (2, 2)
            x = nn.ConvTranspose(dim, (4,), strides=(2,), padding=((2, 2),), dtype=self.dtype,
                                 name=f"up{i}_us")(x)

        x = Conv1dBlock(dims[0], self.kernel_size, self.n_groups, self.dtype, name="final_block")(x)
        return nn.Conv(self.input_dim, (1,), dtype=self.dtype, name="final_conv")(x)
