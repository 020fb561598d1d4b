"""Positional / timestep embeddings used by the diffusion planner.

Parity targets:
- `gen_sineembed_for_position` (`modules/blocks.py:22-40`, DAB-DETR style)
- `SinusoidalPosEmb` (`modules/conditional_unet1d.py:53-66`)
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def gen_sineembed_for_position(pos: jnp.ndarray, hidden_dim: int = 256) -> jnp.ndarray:
    """Sine/cosine embedding of 2D points.

    `pos` has (x, y) in the last dim; returns (..., hidden_dim) laid out as
    [y-embedding, x-embedding], each interleaved sin/cos over frequency pairs.
    """
    import numpy as np

    half = hidden_dim // 2
    # Frequency table in float64 so phases of the highest-frequency channels
    # stay accurate after the (coord * 2*pi / freq) division in float32.
    dim_t = jnp.asarray(10000.0 ** (2.0 * (np.arange(half) // 2) / half), dtype=jnp.float32)
    scale = 2.0 * math.pi

    def _embed(coord: jnp.ndarray) -> jnp.ndarray:
        p = (coord * scale)[..., None] / dim_t  # (..., half)
        interleaved = jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1)
        return interleaved.reshape(*p.shape[:-1], half)

    return jnp.concatenate([_embed(pos[..., 1]), _embed(pos[..., 0])], axis=-1)


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Classic transformer timestep embedding: (B,) -> (B, dim) = [sin | cos]."""
    import numpy as np

    half = dim // 2
    # Host-side float64 table: for t ~ 1000 a 1-ulp float32 error in the
    # frequency shifts the phase by ~1e-4 rad, so accuracy matters here.
    freqs = jnp.asarray(np.exp(np.arange(half) * -(math.log(10000.0) / (half - 1))), dtype=jnp.float32)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
