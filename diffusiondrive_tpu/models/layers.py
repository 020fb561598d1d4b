"""Shared transformer building blocks (Flax linen, NHWC/token-last layouts).

Behavioral parity targets:
- `MultiheadAttention` / torch `nn.TransformerDecoderLayer` (post-LN, ReLU)
  used by the main decoder (`transfuser_model_v2.py:73-82`),
- `linear_relu_ln` (`modules/blocks.py:9-19`),
- the GPT self-attention block of the fusion backbone
  (`transfuser_backbone.py:365-431`).

All matmuls carry `preferred_element_type=float32` semantics via flax Dense
defaults; sequence lengths here are tiny (<= 320 tokens) so plain einsum
attention is the right choice — flash-style kernels would only add overhead.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp


class MultiHeadAttention(nn.Module):
    """Standard MHA with separate q/k/v/out projections (torch layout)."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        q_in: jnp.ndarray,
        k_in: jnp.ndarray,
        v_in: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d_head = self.d_model // self.num_heads
        B, Tq, _ = q_in.shape
        Tk = k_in.shape[1]

        def split(x, T):
            return x.reshape(B, T, self.num_heads, d_head).transpose(0, 2, 1, 3)

        q = split(nn.Dense(self.d_model, dtype=self.dtype, name="q_proj")(q_in), Tq)
        k = split(nn.Dense(self.d_model, dtype=self.dtype, name="k_proj")(k_in), Tk)
        v = split(nn.Dense(self.d_model, dtype=self.dtype, name="v_proj")(v_in), Tk)

        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(d_head)).astype(q.dtype)
        att = nn.softmax(att, axis=-1)
        att = nn.Dropout(self.dropout, deterministic=deterministic)(att)
        y = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        y = y.transpose(0, 2, 1, 3).reshape(B, Tq, self.d_model)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(y)


class TransformerDecoderLayer(nn.Module):
    """torch `nn.TransformerDecoderLayer` semantics: post-LN, ReLU FFN.

    tgt -> self-attn -> +res/LN -> cross-attn(memory) -> +res/LN -> FFN -> +res/LN
    """

    d_model: int
    num_heads: int
    d_ffn: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt: jnp.ndarray, memory: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = tgt
        sa = MultiHeadAttention(self.d_model, self.num_heads, self.dropout, self.dtype,
                                name="self_attn")(x, x, x, deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            x + nn.Dropout(self.dropout, deterministic=deterministic)(sa)
        )
        ca = MultiHeadAttention(self.d_model, self.num_heads, self.dropout, self.dtype,
                                name="cross_attn")(x, memory, memory, deterministic)
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(
            x + nn.Dropout(self.dropout, deterministic=deterministic)(ca)
        )
        h = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        x = nn.LayerNorm(dtype=self.dtype, name="norm3")(
            x + nn.Dropout(self.dropout, deterministic=deterministic)(h)
        )
        return x


class TransformerDecoder(nn.Module):
    """Stack of `TransformerDecoderLayer`s (no final norm, torch default)."""

    d_model: int
    num_heads: int
    d_ffn: int
    num_layers: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt: jnp.ndarray, memory: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = tgt
        for i in range(self.num_layers):
            x = TransformerDecoderLayer(self.d_model, self.num_heads, self.d_ffn, self.dropout,
                                        self.dtype, name=f"layer{i}")(x, memory, deterministic)
        return x


class LinearReluLn(nn.Module):
    """`linear_relu_ln(embed_dims, in_loops, out_loops, input_dims)` equivalent:
    out_loops x [in_loops x (Dense + ReLU), LayerNorm]."""

    embed_dims: int
    in_loops: int = 1
    out_loops: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for o in range(self.out_loops):
            for i in range(self.in_loops):
                x = nn.Dense(self.embed_dims, dtype=self.dtype, name=f"dense_{o}_{i}")(x)
                x = nn.relu(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"ln_{o}")(x)
        return x


class Mlp(nn.Module):
    """Dense -> activation -> Dense."""

    hidden: int
    out: int
    activation: Callable = nn.relu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = self.activation(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """Mish activation (torch `nn.Mish`)."""
    return x * jnp.tanh(nn.softplus(x))
